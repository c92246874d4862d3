"""Sink-side behaviors: partition pruning on the Hive layout, foreachBatch."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from oke_cassandra_spark_locality_demo_spark.catalog import load
from oke_cassandra_spark_locality_demo_spark.plans.inspect import formatted_plan
from oke_cassandra_spark_locality_demo_spark.registry import get
from oke_cassandra_spark_locality_demo_spark.streaming.runtime import events_stream


def test_partition_pruning_on_hive_layout(spark, sf_dir):
    df = get("q_scan_partition_pruned").fn(spark, sf_dir)
    plan = formatted_plan(df)
    # the partition filter must appear as PartitionFilters on the scan,
    # not as a post-scan Filter over all partitions
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200], plan[:2000]


def test_foreachbatch_sink(spark, sf_dir):
    """foreachBatch: the escape hatch for sinks Spark lacks natively
    (JDBC upserts, multi-table writes). Collect per-batch counts through
    a real incremental run."""
    seen: list[int] = []

    def handle(batch_df, batch_id: int) -> None:
        seen.append(batch_df.count())

    ckpt = os.path.join(tempfile.gettempdir(), "graft_feb_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        events_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = load(spark, sf_dir, "events").count()
    assert sum(seen) == total and len(seen) >= 1


# ---------------------------------------------------------------------------
# Task-retry fault injection for the two-phase tokenroute sink (round 10)
# ---------------------------------------------------------------------------

_RETRY_SCRIPT = """
import os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from oke_cassandra_spark_locality_demo_spark.sources.pyds import (
    TokenRouteSinkDataSource,
)

def _users(spark):
    return spark.range(0, 40).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("user"), F.col("id")).alias("name"),
        F.concat(F.lit("user"), F.col("id"), F.lit("@example.com")).alias(
            "email"
        ),
    ).repartition(4)

def _write(spark, path, fail_pid):
    w = _users(spark).write.format("tokenroute_sink").mode("overwrite")
    w = w.option("path", path).option("ranges", "4")
    if fail_pid is not None:
        w = w.option("fail_attempt0_of_partition", str(fail_pid))
    w.save()

out = sys.argv[1]

# Phase 1 — maxFailures=1: the injected attempt-0 death must FAIL the
# job (proves the injection fires; a passing retry test would otherwise
# be vacuous) and must leave NOTHING readable behind: no committed
# bucket files, no visible partials.
spark = (SparkSession.builder.master("local[4,1]")
         .appName("sink-retry-inject")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.dataSource.register(TokenRouteSinkDataSource)
p1 = os.path.join(out, "nofail_budget")
try:
    _write(spark, p1, fail_pid=0)
    print("INJECTION_DID_NOT_FIRE")
    sys.exit(1)
except Exception as e:
    assert "injected failure" in str(e), str(e)[:300]
visible = [f for f in os.listdir(p1) if not f.startswith(("_", "."))]
assert not visible, f"failed job leaked readable files: {{visible}}"
print("PHASE1_FAILSTOP_CLEAN")
spark.stop()

# Phase 2 — maxFailures=2: attempt 0 of partition 0 dies mid-write,
# Spark retries, the job succeeds, and read-back is EXACTLY-ONCE: all
# 40 ids, each exactly once, routed to its token bucket, zero hidden
# temp files surviving commit.
spark = (SparkSession.builder.master("local[4,2]")
         .appName("sink-retry-converge")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.dataSource.register(TokenRouteSinkDataSource)
p2 = os.path.join(out, "retry_converge")
_write(spark, p2, fail_pid=0)
back = spark.read.json(p2)
rows = back.collect()
assert len(rows) == 40, len(rows)
ids = sorted(r["id"] for r in rows)
assert ids == list(range(40)), "duplicate or missing ids after retry"
assert all(r["bucket"] == r["id"] % 4 for r in rows)
leftovers = [f for f in os.listdir(p2) if f.startswith("_tmp-")]
assert not leftovers, f"uncommitted temp files survived: {{leftovers}}"
print("PHASE2_EXACTLY_ONCE_AFTER_RETRY")
"""


def test_tokenroute_sink_survives_task_retry(tmp_path):
    """Fault-injection axis for the write-back path: a task attempt
    that dies MID-WRITE must (a) fail stop-clean when the retry budget
    is exhausted — nothing readable leaks — and (b) converge to an
    exactly-once result when Spark retries it. Runs in a subprocess
    because task retries need the `local[N,maxFailures]` master form,
    which the shared test session doesn't use. The two-phase commit
    (hidden attempt-unique temp files renamed only by the driver-side
    commit) is what makes both properties hold; the pre-r10 writer
    wrote final-named files straight from write()."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _RETRY_SCRIPT.format(repo=repo),
         str(tmp_path)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONDONTWRITEBYTECODE": "1"},
    )
    assert proc.returncode == 0, (proc.stdout[-800:], proc.stderr[-1500:])
    assert "PHASE1_FAILSTOP_CLEAN" in proc.stdout
    assert "PHASE2_EXACTLY_ONCE_AFTER_RETRY" in proc.stdout


def test_tokenroute_commit_failstops_on_missing_winner(tmp_path):
    """ADVICE r10: commit() must not silently skip a WINNING task's
    rename when its temp file is gone — that would surface as missing
    output rows. Exercised directly on the writer object (no session
    needed: commit() is pure driver-side file logic)."""
    import pytest

    from oke_cassandra_spark_locality_demo_spark.sources.pyds import (
        _TokenRouteCommit,
        _TokenRouteWriter,
    )

    d = str(tmp_path)
    w = _TokenRouteWriter(d, 4, None)
    tmp = os.path.join(d, "_tmp-bucket=0-task=0-attempt=0.jsonl")
    final = os.path.join(d, "bucket=0-task=0.jsonl")

    # (a) winner temp missing AND final absent → loud failure
    with pytest.raises(RuntimeError, match="winner temp"):
        w.commit([_TokenRouteCommit([(tmp, final)])])

    # (b) final already published (duplicate commit message / re-run
    # over a committed epoch) → idempotent no-op, no raise
    with open(final, "w") as f:
        f.write('{"id": 0}\n')
    w.commit([_TokenRouteCommit([(tmp, final)])])
    assert os.path.exists(final)

    # (c) normal path still renames and sweeps loser temps
    with open(tmp, "w") as f:
        f.write('{"id": 4}\n')
    loser = os.path.join(d, "_tmp-bucket=1-task=9-attempt=0.jsonl")
    with open(loser, "w") as f:
        f.write("{}\n")
    w.commit([_TokenRouteCommit([(tmp, final)])])
    assert not os.path.exists(tmp) and not os.path.exists(loser)
    with open(final) as f:
        assert '"id": 4' in f.read()


def test_bucketed_table_atexit_reclamation(tmp_path):
    """ADVICE r10: q_join_bucketed's PID-suffixed managed tables must
    not permanently leak warehouse directories — the registered atexit
    hook reclaims this process's pairs, and a fork()ed child (different
    PID) must NOT reclaim the parent's."""
    from oke_cassandra_spark_locality_demo_spark.sources import ingest

    wh = str(tmp_path)
    names = ("orders_bkt_test", "lineitem_bkt_test")
    for n in names:
        os.makedirs(os.path.join(wh, n))
    ingest._register_bucketed_cleanup(wh, names)
    assert ingest._BUCKETED_HOOKED[0]

    # PID guard: simulate the fork()ed-child case
    real_pid = ingest._BUCKETED_OWNER_PID
    try:
        ingest._BUCKETED_OWNER_PID = real_pid + 1
        ingest._reap_bucketed_tables()
        assert all(os.path.isdir(os.path.join(wh, n)) for n in names)
    finally:
        ingest._BUCKETED_OWNER_PID = real_pid

    # owner process reclaims
    ingest._reap_bucketed_tables()
    assert not any(os.path.isdir(os.path.join(wh, n)) for n in names)
    for n in names:
        ingest._BUCKETED_TABLES.discard((wh, n))


def test_stream_stage_reaper_reclaims_superseded_copies(tmp_path):
    """ADVICE r10 + r11: last-wins staging publication must reclaim
    superseded events.{pid} copies, but the grace period is bound to
    SUPERSESSION time (the stamp the reaper lays down on first
    observation), not the directory's own mtime — a parquet read
    never touches dir mtime, so an ancient-but-just-superseded copy
    may still have a live reader and must get a full grace window."""
    from oke_cassandra_spark_locality_demo_spark.streaming import runtime

    base = str(tmp_path)
    sfx = runtime._SUPERSEDED_SUFFIX
    old = runtime._STAGE_REAP_GRACE_SEC + 60
    now = __import__("time").time()

    def mkstage(name, age):
        p = os.path.join(base, name)
        os.makedirs(p, exist_ok=True)
        os.utime(p, (now - age, now - age))
        return p

    keep = mkstage("events.100", old)          # marker-named, ancient
    stale = mkstage("events.200", old)         # superseded, ancient dir
    fresh = mkstage("events.300", 10)          # superseded, recent dir
    orphan_tmp = os.path.join(base, "_staged_multi.999")
    with open(orphan_tmp, "w") as f:
        f.write("events.999")
    os.utime(orphan_tmp, (now - old, now - old))
    orphan_stamp = os.path.join(base, "events.777" + sfx)
    with open(orphan_stamp, "w") as f:
        f.write("events.100")

    # Pass 1: NOTHING superseded gets reaped regardless of dir age —
    # the pass only lays supersession stamps and starts the clock
    # (ADVICE r11: dir mtime said staging recency, not reader recency)
    runtime._reap_stale_stages(base, keep="events.100")
    assert os.path.isdir(keep), "marker-named copy must survive any age"
    assert os.path.isdir(stale), "ancient dir gets a grace window from supersession"
    assert os.path.isdir(fresh)
    assert os.path.exists(stale + sfx), "superseded dir must be stamped"
    assert os.path.exists(fresh + sfx)
    assert not os.path.exists(keep + sfx), "marker-named copy is never stamped"
    assert not os.path.exists(orphan_tmp), "orphaned marker temp must go"
    assert not os.path.exists(orphan_stamp), "stamp without a dir must go"

    # Pass 2, stamps aged past grace: the SUPERSEDED-for-long copies
    # go (stamp too), however recently their dirs were staged
    os.utime(stale + sfx, (now - old, now - old))
    os.utime(fresh + sfx, (now - old, now - old))
    runtime._reap_stale_stages(base, keep="events.100")
    assert os.path.isdir(keep)
    assert not os.path.isdir(stale) and not os.path.exists(stale + sfx)
    assert not os.path.isdir(fresh) and not os.path.exists(fresh + sfx)

    # Re-election: a dir the marker names again has its stamp cleared
    # (clock restart), and a racing pass must not refresh a live stamp
    relect = mkstage("events.400", 10)
    with open(relect + sfx, "w") as f:
        f.write("events.100")
    runtime._reap_stale_stages(base, keep="events.400")
    assert os.path.isdir(relect)
    assert not os.path.exists(relect + sfx), "re-elected dir's stamp must clear"


def test_stream_stage_reaper_no_same_pass_orphan_stamp(tmp_path, monkeypatch):
    """ADVICE r12: within one reap pass, if a dir's expired .superseded
    stamp is iterated BEFORE the dir's own listdir entry (os.listdir
    order is arbitrary), the reap (rmtree + stamp unlink) must not be
    followed by the stale `dirs` snapshot re-stamping the now-deleted
    directory — that orphan stamp would linger until the next pass.
    Deterministically forces the adversarial order via a pinned
    listdir, and also pins the isdir guard for a dir that vanished
    between the listdir snapshot and stamp creation."""
    import time

    from oke_cassandra_spark_locality_demo_spark.streaming import runtime

    base = str(tmp_path)
    sfx = runtime._SUPERSEDED_SUFFIX
    now = time.time()
    old = runtime._STAGE_REAP_GRACE_SEC + 60

    doomed = os.path.join(base, "events.500")
    os.makedirs(doomed)
    with open(doomed + sfx, "w") as f:
        f.write("events.100")
    os.utime(doomed + sfx, (now - old, now - old))

    real_listdir = os.listdir

    def stamp_first(path):
        entries = real_listdir(path)
        return sorted(entries, key=lambda e: not e.endswith(sfx))

    monkeypatch.setattr(runtime.os, "listdir", stamp_first)
    runtime._reap_stale_stages(base, keep="events.100")
    monkeypatch.undo()
    assert not os.path.isdir(doomed), "expired-stamp dir must be reaped"
    assert not os.path.exists(doomed + sfx), (
        "same-pass re-stamp of a reaped dir (orphan stamp) — the stale "
        "dirs snapshot leaked through"
    )

    # isdir guard: a listdir snapshot naming a dir that no longer
    # exists on disk must not produce a stamp for it
    ghost = os.path.join(base, "events.600")

    def with_ghost(path):
        return real_listdir(path) + ["events.600"]

    monkeypatch.setattr(runtime.os, "listdir", with_ghost)
    runtime._reap_stale_stages(base, keep="events.100")
    monkeypatch.undo()
    assert not os.path.exists(ghost + sfx), "stamped a nonexistent dir"
