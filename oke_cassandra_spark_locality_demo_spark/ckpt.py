"""Tracked local checkpoints: explicit release of SUPERSEDED iterative
state (r11).

The iterative graph operators (pagerank / cc / bfs / sssp / kcore)
``localCheckpoint`` each round to truncate lineage — the right 100 TB
posture — but Spark offers no DataFrame-level release for a local
checkpoint (``DataFrame.unpersist()`` does not touch the checkpointed
RDD; measured r11), so every superseded round's node/rank/label set
stayed pinned in block storage until the JVM's periodic GC
(``spark.cleaner.periodicGC.interval``, 30 min default). In a
long-lived session that is O(rounds) dead block sets per invocation —
storage pressure that ages the session for every later query.

``tracked_local_checkpoint`` tags the returned DataFrame with the RDD
ids its eager materialization persisted (diff of
``SparkContext.getPersistentRDDs`` around the call — deterministic in
the engine's single-threaded query builders); ``release_checkpoint``
unpersists exactly those ids.

SAFETY CONTRACT: a released local checkpoint CANNOT be recomputed
(lineage is truncated; re-reading raises CHECKPOINT_RDD_BLOCK_ID_NOT_
FOUND loudly — measured, not assumed). Callers therefore release ONLY
provably superseded state: the previous round's set, after the next
round's EAGER checkpoint has fully materialized and no returned plan
references it. State the returned DataFrame depends on (final
iterate, edge tables) is never released here — it stays pinned for
the caller and is reclaimed by the context cleaner once the handle
dies, exactly as before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: attribute carrying the persisted RDD ids on a tracked DataFrame
_IDS_ATTR = "_spark_graft_ckpt_ids"


def _persistent_ids(spark) -> set[int]:
    out: set[int] = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().keySet().iterator()
    while it.hasNext():
        out.add(int(it.next()))
    return out


def tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint()`` (eager) + record which persistent RDD
    ids the materialization created, so release_checkpoint can free
    them without guessing.

    Attribution guard (ADVICE r11): an eager localCheckpoint persists
    exactly ONE new RDD, so a before/after diff of any other size
    means something else persisted concurrently (a streaming query, a
    parallel builder) and the global diff cannot be attributed to this
    checkpoint — releasing a misattributed id would force-unpersist
    state we do not own, and a released local checkpoint is
    unrecoverable by design. In that case warn and skip tracking: the
    superseded round leaks until the context cleaner collects it
    (exactly the pre-r11 behavior), which is always safe, never wrong.
    """
    import warnings

    spark = df.sparkSession
    before = _persistent_ids(spark)
    out = df.localCheckpoint()  # eager by default
    new_ids = sorted(_persistent_ids(spark) - before)
    if len(new_ids) != 1:
        warnings.warn(
            "tracked_local_checkpoint: getPersistentRDDs diff has "
            f"{len(new_ids)} new ids ({new_ids}); concurrent persist "
            "activity makes attribution unsafe — skipping release "
            "tracking for this checkpoint (state falls back to "
            "context-cleaner reclamation)",
            RuntimeWarning,
            stacklevel=2,
        )
        new_ids = []
    object.__setattr__(out, _IDS_ATTR, new_ids)
    return out


def release_checkpoint(df: DataFrame | None) -> None:
    """Unpersist the block sets a tracked_local_checkpoint pinned.

    No-op for None or untracked frames. Only call on SUPERSEDED state
    (see the module safety contract) — a released checkpoint that is
    re-read fails loudly by design."""
    if df is None:
        return
    ids = getattr(df, _IDS_ATTR, None)
    if not ids:
        return
    jmap = df.sparkSession.sparkContext._jsc.sc().getPersistentRDDs()
    for rdd_id in ids:
        opt = jmap.get(rdd_id)
        if opt.isDefined():
            opt.get().unpersist(False)
    object.__setattr__(df, _IDS_ATTR, [])
