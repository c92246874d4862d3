

def test_split_part_edge_semantics(spark):
    """The three split_part edge cases q_fn_split_part's docstring
    claims agree across engines, pinned against Spark directly:
    1-based indexing, EMPTY STRING (not null) past the last field, and
    the whole input when the delimiter is absent."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a-b",), ("plain",), ("x-y-z",)], ["s"]
    ).select(
        F.split_part("s", F.lit("-"), F.lit(1)).alias("p1"),
        F.split_part("s", F.lit("-"), F.lit(2)).alias("p2"),
        F.split_part("s", F.lit("-"), F.lit(9)).alias("p9"),
    )
    rows = {tuple(r) for r in df.collect()}
    assert rows == {
        ("a", "b", ""),
        ("plain", "", ""),
        ("x", "y", ""),
    }


def test_variant_extraction_semantics(spark, sf_dir):
    """q_fn_variant's contract pinned directly: variant_get extracts
    typed paths from parse_json, try_variant_get yields NULL (never an
    error) on a missing path, and the int/bigint extractions agree on
    every row."""
    from oke_cassandra_spark_locality_demo_spark.registry import get

    rows = get("q_fn_variant").fn(spark, sf_dir).limit(200).collect()
    assert rows
    for r in rows:
        assert r.missing_str is None
        assert r.k_variant == r.k_long
        assert r.vtype.startswith("OBJECT"), r.vtype


def test_xml_roundtrip_preserves_typed_fields(spark, sf_dir):
    """q_fn_xml's round-trip contract pinned against the source table:
    the parsed cust/status/total must equal the original row values
    (total through the decimal(12,2) print path), proving from_xml
    actually parses rather than pattern-matching."""
    from pyspark.sql import functions as F

    from oke_cassandra_spark_locality_demo_spark.catalog import load
    from oke_cassandra_spark_locality_demo_spark.registry import get

    got = {
        r.o_orderkey: (r.cust, r.status, r.total)
        for r in get("q_fn_xml").fn(spark, sf_dir).collect()
    }
    src = {
        r.o_orderkey: (
            r.o_custkey,
            r.o_orderstatus,
            float(r.total_dec),
        )
        for r in load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(12,2)").alias("total_dec"),
        )
        .collect()
    }
    assert got == src


def test_source_xml_roundtrip_equals_nation(spark, sf_dir):
    """q_source_xml (r8/r9 block): the native-XML round-trip must
    reproduce the nation dimension exactly — same rows, declared
    types honored (int keys come back as ints)."""
    from oke_cassandra_spark_locality_demo_spark.catalog import load
    from oke_cassandra_spark_locality_demo_spark.registry import get

    got = [
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in get("q_source_xml").fn(spark, sf_dir).collect()
    ]
    src = sorted(
        (int(r.n_nationkey), r.n_name, int(r.n_regionkey))
        for r in load(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    )
    assert got == src


def test_join_anti_complement_identity(spark, sf_dir):
    """q_join_anti returns 0 rows at sf0.001/0.01 (every customer has
    orders), so its r1/r2 adjudications were 0=0 — true empties. Prove
    the mechanics anyway: (1) on the fixture, the anti set must be the
    exact complement of the distinct-custkey semi set; (2) on inline
    data with a known orphan, the same left_anti shape must emit
    exactly that orphan."""
    from oke_cassandra_spark_locality_demo_spark.registry import get
    from oke_cassandra_spark_locality_demo_spark.sources.ingest import load

    anti = {r.c_custkey for r in get("q_join_anti").fn(spark, sf_dir).collect()}
    customers = {
        r.c_custkey for r in load(spark, sf_dir, "customer").select("c_custkey").collect()
    }
    with_orders = {
        r.o_custkey
        for r in load(spark, sf_dir, "orders").select("o_custkey").distinct().collect()
    }
    assert anti == customers - with_orders

    c = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "c_custkey int, c_name string"
    )
    o = spark.createDataFrame([(1,), (3,), (3,)], "o_custkey int")
    got = {
        r.c_custkey
        for r in c.join(o, c.c_custkey == o.o_custkey, "left_anti").collect()
    }
    assert got == {2}


def test_sample_hash_matches_bruteforce(spark, sf_dir):
    """q_sample_hash and its oracle share the md5-prefix-threshold
    formulation, so parity can't catch a shared formulation bug;
    recompute membership in plain Python (hashlib.md5 over the
    'orderkey-linenumber' key, per-stratum hex thresholds) and require
    the exact same row set. Also pins that both strata are non-empty
    and the realized rates sit near the designed ~20%/~10% (loose
    3×-bounds — the check is non-vacuousness, not statistics)."""
    import hashlib

    from oke_cassandra_spark_locality_demo_spark.catalog import load
    from oke_cassandra_spark_locality_demo_spark.operators.scans import (
        q_sample_hash,
    )

    rows = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    ).collect()
    totals = {"R": 0, "other": 0}
    expect = set()
    for r in rows:
        stratum = "R" if r.l_returnflag == "R" else "other"
        totals[stratum] += 1
        pfx = hashlib.md5(
            f"{r.l_orderkey}-{r.l_linenumber}".encode()
        ).hexdigest()[:2]
        if pfx < ("33" if stratum == "R" else "1a"):
            expect.add((r.l_orderkey, r.l_linenumber))

    got = {
        (r.l_orderkey, r.l_linenumber)
        for r in q_sample_hash(spark, sf_dir).collect()
    }
    assert got == expect
    kept = {"R": 0, "other": 0}
    for r in rows:
        stratum = "R" if r.l_returnflag == "R" else "other"
        if (r.l_orderkey, r.l_linenumber) in expect:
            kept[stratum] += 1
    for stratum, design in (("R", 0.2), ("other", 0.1)):
        rate = kept[stratum] / totals[stratum]
        assert design / 3 < rate < design * 3, (stratum, rate)


class TestCheckpointRelease:
    """r11: iterative graph operators must not pin superseded per-round
    localCheckpoint block sets until the JVM's periodic GC — ckpt.py
    releases each round's state once the next round's eager checkpoint
    materializes. Residue per invocation = only the blocks the RETURNED
    plan still needs (kcore: edges + final nodes = 2; the others: 1)."""

    def test_tracked_checkpoint_release_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from oke_cassandra_spark_locality_demo_spark import ckpt

        before = ckpt._persistent_ids(spark)
        df = ckpt.tracked_local_checkpoint(
            spark.range(1000).withColumn("x", F.col("id") * 2)
        )
        ids = getattr(df, ckpt._IDS_ATTR)
        assert ids and set(ids).isdisjoint(before)
        assert df.count() == 1000
        ckpt.release_checkpoint(df)
        assert ckpt._persistent_ids(spark).isdisjoint(ids)
        # released frames and untracked frames are both no-ops
        ckpt.release_checkpoint(df)
        ckpt.release_checkpoint(spark.range(3))
        ckpt.release_checkpoint(None)

    def test_iterative_ops_bounded_checkpoint_residue(self, spark, sf_dir):
        from oke_cassandra_spark_locality_demo_spark import ckpt
        from oke_cassandra_spark_locality_demo_spark.registry import get

        budgets = {"q_graph_kcore": 2, "q_graph_cc": 1, "q_graph_sssp": 1}
        for name, budget in budgets.items():
            before = len(ckpt._persistent_ids(spark))
            get(name).fn(spark, sf_dir).count()
            after = len(ckpt._persistent_ids(spark))
            # ContextCleaner may reclaim older garbage concurrently, so
            # the count can DROP; it must never grow past the per-
            # invocation budget (pre-r11 kcore grew by ~2 + rounds)
            assert after - before <= budget, (name, before, after)


def test_sketch_theta_rework_parity_vs_reference_formulation(spark, tmp_path):
    """r14 optimization parity pin (the q_dedup_simhash-parity pattern):
    q_agg_sketch_theta's single-pass formulation — one
    groupBy(user, day).collect_set(segment) table feeding per-segment
    exacts, sketches, and a JOIN-FREE intersection (h < theta_min ⇒ the
    hash has rank < k in both sketches, so both-segment membership is
    the whole test) — must emit exactly the rows of the pre-r14
    reference: distinct (segment,user,day) + per-segment window sketch +
    pair SELF-JOIN + sketch-side join. The planted corpus exercises the
    branches the driver fixtures may not: a segment past k (theta
    non-null), one under k (theta null), a non-trivial intersection,
    and items on both sides of the theta_min cut."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from oke_cassandra_spark_locality_demo_spark.operators.aggregates import (
        _KMV_K,
        _TWO63,
        _TWO64,
    )
    from oke_cassandra_spark_locality_demo_spark.registry import get

    # planted corpus: click = 500 user-days (> k=256, theta engages),
    # purchase = 400 with 300 overlapping click, view = 40 (< k, theta
    # NULL). Duplicate raw events confirm the distinct. One user crosses
    # two days (day matters in the item key).
    rows = []
    day0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    eid = 0

    def add(user, day_off, etype, times=1):
        nonlocal eid
        for _ in range(times):
            rows.append(
                (eid, day0 + datetime.timedelta(days=day_off), user, etype, 1.0, "{}")
            )
            eid += 1

    for u in range(500):
        add(u, 0, "click", times=2 if u % 7 == 0 else 1)
    for u in range(200, 600):
        add(u, 0, "purchase")
    for u in range(40):
        add(u, 1, "view")
    add(3, 1, "click")  # same user, second day: distinct item
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    sf = str(tmp_path / "theta")
    os.makedirs(sf, exist_ok=True)
    pq.write_table(tbl, os.path.join(sf, "events.parquet"))

    # ---- pre-r14 reference formulation, verbatim shape ----
    e = spark.read.parquet(os.path.join(sf, "events.parquet"))
    t = e.select(
        F.col("event_type").alias("segment"),
        "user_id",
        F.col("ts").cast("date").alias("d"),
    ).distinct()
    exact = t.groupBy("segment").agg(F.count(F.lit(1)).alias("exact_n"))
    pair_exact = (
        t.filter(F.col("segment") == "click")
        .select("user_id", "d")
        .join(
            t.filter(F.col("segment") == "purchase").select("user_id", "d"),
            ["user_id", "d"],
        )
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .select(F.lit("click&purchase").alias("segment"), "exact_n")
    )
    h = t.select(
        "segment",
        F.xxhash64(
            F.concat_ws(":", F.col("user_id"), F.col("d").cast("string"))
        ).alias("h"),
    )
    rn = F.row_number().over(Window.partitionBy("segment").orderBy("h"))
    sk = h.withColumn("rn", rn).filter(F.col("rn") <= _KMV_K)
    stats = sk.groupBy("segment").agg(
        F.count(F.lit(1)).alias("m"), F.max("h").alias("hk")
    )
    u_k = (F.col("hk") + _TWO63) / _TWO64
    est = stats.select(
        "segment",
        F.when(F.col("m") < _KMV_K, F.col("m").cast("double"))
        .otherwise((_KMV_K - 1) / u_k)
        .alias("est"),
        F.when(F.col("m") < _KMV_K, F.lit(None).cast("long"))
        .otherwise(F.col("hk"))
        .alias("theta_raw"),
    )
    th = est.filter(F.col("segment").isin("click", "purchase")).agg(
        F.min(F.col("theta_raw")).alias("th_raw")
    )
    common = (
        sk.filter(F.col("segment") == "click")
        .select("h")
        .join(sk.filter(F.col("segment") == "purchase").select("h"), "h")
        .crossJoin(F.broadcast(th))
        .filter(F.col("th_raw").isNull() | (F.col("h") < F.col("th_raw")))
        .agg(
            F.count(F.lit(1)).alias("n_c"),
            F.first(F.col("th_raw"), ignorenulls=False).alias("th_raw"),
        )
    )
    pair_est = common.select(
        F.lit("click&purchase").alias("segment"),
        F.when(F.col("th_raw").isNull(), F.col("n_c").cast("double"))
        .otherwise(F.col("n_c") / ((F.col("th_raw") + _TWO63) / _TWO64))
        .alias("est"),
    )
    band = F.abs(F.col("est") - F.col("exact_n")) <= 0.25 * F.col("exact_n")
    ref = (
        exact.join(est.select("segment", "est"), "segment")
        .unionByName(pair_exact.join(F.broadcast(pair_est), "segment"))
        .select("segment", "exact_n", band.alias("within_band"))
    )
    ref_rows = sorted(tuple(r) for r in ref.collect())

    got_rows = sorted(tuple(r) for r in get("q_agg_sketch_theta").fn(spark, sf).collect())
    assert got_rows == ref_rows, (got_rows, ref_rows)
    # non-vacuous: theta engaged (click past k), intersection non-empty
    segs = {r[0]: r[1] for r in got_rows}
    assert segs["click"] > _KMV_K
    assert segs["click&purchase"] == 300
