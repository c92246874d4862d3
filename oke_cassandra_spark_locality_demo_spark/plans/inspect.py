"""Physical-plan inspection: the testable proxies for the reference's
locality/pushdown claims (SURVEY §4.1 — B2/B3/B4 verification).

`local[*]` can't demonstrate node locality, so the engine's claims are
checked structurally instead: filters visible in `PushedFilters`, pruned
`ReadSchema`, broadcast joins where hinted, and no superfluous Exchange
in co-partitioned plans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached the parquet scan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning evidence)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            if ":" in field:
                cols.append(field.split(":")[0].strip())
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the final (AQE) plan."""
    return len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", simple_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", simple_plan(df))))
