"""Streaming runtime helpers: file-source setup + availableNow execution.

The fixture `events.parquet` is a single file; Structured Streaming file
sources want a directory they can list incrementally, so we stage a copy
(one-time per sf_dir) into a temp dir. `run_streaming_query` then runs
any events→DataFrame transformation as a real incremental query into a
memory sink and returns the collected result table.

At production scale the same code points `readStream` at the ingest
directory/Kafka topic; `availableNow` is the batch-backfill trigger
(process everything present, then stop) — the standard pattern for
replaying history through the same query that serves the live stream.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_STAGE_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_stream")


def stage_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Copy events.parquet into a streaming-source directory (idempotent).

    Cross-process safety (r10, same audit as workdir.py): the staged
    copy is a shared cache keyed by sf_dir — worth keeping shared
    (staging sf0.1 events costs a full rewrite) but the old
    overwrite-in-place + empty-marker protocol let two first-stagers
    write the SAME directory concurrently. Now each stager writes a
    PID-unique directory and publishes it by atomically replacing the
    marker file, whose CONTENT names the completed directory: readers
    only ever follow the marker to a fully-written copy, concurrent
    stagers publish last-wins, and nobody deletes a directory another
    process might be reading. Pre-r10 empty markers fail the content
    check and simply restage."""
    from ..catalog import load

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(_STAGE_ROOT, tag)
    marker = os.path.join(base, "_staged_multi")
    if os.path.exists(marker):
        with open(marker) as f:
            staged = f.read().strip()
        if staged:
            out = os.path.join(base, staged)
            if os.path.isdir(out):
                return out
    # catalog.load handles the fixture's TIMESTAMP(NANOS) → µs staging.
    # 8 files, not 1: a real ingest directory accumulates many files,
    # and maxFilesPerTrigger-based queries (q_stream_cdc_upsert) need
    # >1 to exercise genuine multi-batch incremental processing.
    name = f"events.{os.getpid()}"
    out = os.path.join(base, name)
    load(spark, sf_dir, "events").repartition(8).write.mode(
        "overwrite"
    ).parquet(out)
    tmp = f"{marker}.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(name)
    os.replace(tmp, marker)
    _reap_stale_stages(base, keep=name)
    return out


#: Reclamation grace for superseded staging copies, measured from the
#: moment a directory was FIRST OBSERVED superseded (its supersession
#: stamp's mtime), not from the directory's own mtime: parquet reads
#: never touch a directory's mtime, so dir-age said nothing about
#: reader recency (ADVICE r11 — a long-lived process that resolved a
#: >30-min-old copy seconds before it was superseded could have it
#: rmtree'd mid-query under the old mtime rule). Any reader that
#: followed the marker saw this directory named no later than the
#: stamp's creation, so stamp-age ≥ the reader's session age on that
#: copy — and no oracle-drive query streams one staged copy for 30
#: minutes.
_STAGE_REAP_GRACE_SEC = 1800

#: Suffix of the per-directory supersession stamps (sibling files,
#: not inside the stage dir — Spark must never list them as data).
_SUPERSEDED_SUFFIX = ".superseded"


def _reap_stale_stages(base: str, keep: str) -> None:
    """Best-effort reclamation of superseded ``events.{pid}`` staging
    directories (ADVICE r10, grace re-bound r12): last-wins marker
    publication previously left every losing stager's full parquet
    copy in /tmp forever (_STAGE_ROOT is outside the workdir atexit
    cleanup). After publishing, each sibling copy the marker no
    longer names gets a supersession stamp on first observation and
    is deleted only once that stamp is older than the grace period —
    so a still-running process that resolved the copy just before it
    was superseded keeps a full grace window to finish reading,
    regardless of how long ago the copy was staged (ADVICE r11: mtime
    bounded staging recency, not reader recency). A re-published
    directory (its stager restages and wins again) gets its stamp
    cleared. Orphaned marker temps keep the simple mtime rule — they
    are never read by another process. Failures are ignored: worst
    case the litter bound reverts to the documented
    one-copy-per-racing-stager.
    """
    import shutil
    import time

    now = time.time()
    try:
        siblings = os.listdir(base)
    except OSError:
        return
    dirs = {e for e in siblings if e.startswith("events.") and
            not e.endswith(_SUPERSEDED_SUFFIX)}
    for entry in siblings:
        path = os.path.join(base, entry)
        try:
            if entry.startswith("_staged_multi."):
                # marker temp orphaned by a failed os.replace: private
                # to its writer, mtime-age is the right bound
                if now - os.path.getmtime(path) > _STAGE_REAP_GRACE_SEC:
                    os.unlink(path)
                continue
            if entry.endswith(_SUPERSEDED_SUFFIX):
                stage = entry[: -len(_SUPERSEDED_SUFFIX)]
                if stage == keep:
                    # re-elected: the marker names this dir again, so
                    # it is no longer superseded — restart its clock
                    os.unlink(path)
                elif stage not in dirs:
                    # stamp orphaned by a completed reap
                    os.unlink(path)
                elif now - os.path.getmtime(path) > _STAGE_REAP_GRACE_SEC:
                    shutil.rmtree(os.path.join(base, stage),
                                  ignore_errors=True)
                    os.unlink(path)
                    # keep the snapshot honest within this pass: if the
                    # dir's own listdir entry is iterated AFTER its
                    # expired stamp (os.listdir order is arbitrary),
                    # the stale snapshot would re-stamp the directory
                    # we just reaped, leaving an orphan stamp until the
                    # next pass (ADVICE r12)
                    dirs.discard(stage)
                continue
            if entry in dirs and entry != keep and os.path.isdir(path):
                stamp = path + _SUPERSEDED_SUFFIX
                if not os.path.exists(stamp):
                    # first observation as superseded: start the clock
                    # (exclusive create — a racing publisher must not
                    # refresh an existing stamp and extend the clock)
                    with open(stamp, "x") as f:
                        f.write(keep)
        except OSError:
            pass


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the staged events directory (schema from batch)."""
    from ..memharden import starved_parts

    # Streaming state partitioning is fixed at query start from
    # spark.sql.shuffle.partitions, and AQE never re-plans stateful
    # stages — under deliberate execution-memory starvation a 32-wide
    # state store starves exactly like the batch stages memharden
    # barriers (measured: q_stream_stateful_tws fail-stops at
    # local[32] + fraction=0.05). starved_parts() applies the same
    # session narrowing the batch path uses (no-op at normal memory).
    starved_parts(spark)
    src = stage_events_dir(spark, sf_dir)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src)


_SINK_SEQ = [0]


def run_streaming_query(
    spark: SparkSession,
    sf_dir: str,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
) -> DataFrame:
    """Run `transform(events_stream)` to completion with availableNow into
    a memory sink; return the sink contents as a DataFrame."""
    _SINK_SEQ[0] += 1
    name = f"graft_sink_{_SINK_SEQ[0]}"
    q = (
        transform(events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from ..memharden import stage_barrier

    # memharden barrier on the sink read (identity at normal memory):
    # memory-sink tables scan at the master's full width, and a
    # 32-wide post-sink partial aggregate fail-stops at the
    # local[32] + fraction=0.05 extreme — every streaming key's batch
    # post-processing starts narrow from here instead
    return stage_barrier(spark.table(name))
