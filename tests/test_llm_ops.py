"""Recall/error assertions for the approx operators (rows-only keys) —
"weaker check ≠ no check" (SURVEY §7)."""

from __future__ import annotations

import os
import pathlib

import pytest
from pyspark.sql import functions as F

from oke_cassandra_spark_locality_demo_spark.registry import get


def test_minhash_recall_vs_exact(spark, sf_dir):
    """LSH candidates + exact verification must recover ≥90% of the true
    Jaccard-≥0.8 pairs (16 bands × 4 rows ⇒ expected recall ≥99.9%)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in get("q_dedup_ngram_jaccard").fn(spark, sf_dir).collect()
        if r["jaccard"] >= 0.8
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in get("q_dedup_minhash").fn(spark, sf_dir).collect()
    }
    # Hard non-emptiness (vacuousness audit, r9): the fixture holds
    # jaccard>=0.8 pairs at every SF (25 @ sf0.01, 28 @ sf0.001,
    # measured) — an empty exact set means the ngram_jaccard baseline
    # regressed, and `if exact:` would have silently skipped the
    # recall assertion instead of catching it.
    assert exact, "exact jaccard>=0.8 baseline is empty — fixture or baseline regressed"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"recall={recall} exact={len(exact)} lsh={len(lsh)}"
    # no false positives: every reported pair truly has jaccard ≥ 0.8
    assert lsh <= lsh | exact  # reported pairs are verified exactly by construction


def test_simhash_pairs_are_close(spark, sf_dir):
    df = get("q_dedup_simhash").fn(spark, sf_dir)
    assert df.filter(F.col("hamming") > 6).count() == 0


def test_simhash_rework_parity_vs_reference_formulation(spark, sf_dir):
    """r13 optimization-round equivalence pin: q_dedup_simhash is
    rows-only (no SQL oracle), so its r13 rework — SWAR-packed bit sums
    and per-bucket collect_list pair generation replacing the band
    self-join + separate occupancy guard — is brute-forced here against
    the pre-r13 REFERENCE formulation (64 conditional ±1 sums, bands
    exploded and self-joined, occupancy guard as a groupBy+join). Both
    the fingerprints and the emitted pair set must match exactly; a
    divergence in either the SWAR unpacking or the in-bucket pair
    enumeration flips this test."""
    from oke_cassandra_spark_locality_demo_spark.llm.dedup import (
        SIMHASH_BAND_WIDTH,
        SIMHASH_BUCKET_CAP,
        SIMHASH_HAMMING_MAX,
        SIMHASH_NBANDS,
        _norm_text,
    )
    from oke_cassandra_spark_locality_demo_spark.sources.ingest import load

    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.split(_norm_text(F.col("text")), " ")).alias("w"),
    )
    h = F.xxhash64("w")
    bit_sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    fp = bit_sums.select(
        "doc_id",
        sum(
            [
                F.when(
                    F.col(f"b{i}") > 0,
                    F.lit(1).cast("long") * (1 << i)
                    if i < 63
                    else F.lit(-(1 << 63)).cast("long"),
                ).otherwise(0)
                for i in range(64)
            ]
        ).alias("simhash"),
    )
    band_mask = (1 << SIMHASH_BAND_WIDTH) - 1
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * SIMHASH_BAND_WIDTH)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("bucket"),
                    )
                    for b in range(SIMHASH_NBANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")
    ok_buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") <= SIMHASH_BUCKET_CAP)
        .select("band", "bucket")
    )
    bands = bands.join(ok_buckets, ["band", "bucket"])
    reference = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
    )
    new = get("q_dedup_simhash").fn(spark, sf_dir)
    assert reference.exceptAll(new).count() == 0
    assert new.exceptAll(reference).count() == 0


def test_containment_df_cap_exceeds_fixture_df(spark, sf_dir):
    """The CONTAINMENT_DF_CAP scale guard must be invisible at test
    scales: the fixture's maximum shingle document-frequency has to sit
    FAR below the cap, so the capped plan is bit-identical to the
    uncapped DuckDB oracle (VERDICT r5 item 2 — the cap exists for
    10^9-doc corpora, not for the fixture)."""
    from oke_cassandra_spark_locality_demo_spark.llm.dedup import (
        CONTAINMENT_DF_CAP,
        _shingles,
    )
    from oke_cassandra_spark_locality_demo_spark.sources.ingest import load

    d = load(spark, sf_dir, "documents")
    max_df = (
        _shingles(d)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df"))
        .collect()[0][0]
    )
    # "far below": an order of magnitude of headroom, not a near-miss
    assert max_df * 10 <= CONTAINMENT_DF_CAP, (
        f"fixture max shingle df {max_df} too close to cap "
        f"{CONTAINMENT_DF_CAP} — capped results may diverge from the "
        f"uncapped oracle"
    )


def test_fixture_contract_text_non_null(spark, sf_dir):
    """Fixture contract (ADVICE r7): documents.text is non-null at every
    SF. q_dedup_containment's |S_B| denominator uses non-ANSI F.size,
    which returns -1 for a NULL text where the former exploded groupBy
    omitted the doc — harmless while this contract holds (null-text docs
    never reach the pair join), but a regenerated fixture with nulls
    would make that sizes frame unsafe to reuse as a general doc-size
    relation. Pin the contract here so a fixture change fails with a
    named invariant, not a wrong-signed containment."""
    from oke_cassandra_spark_locality_demo_spark.sources.ingest import load

    d = load(spark, sf_dir, "documents")
    assert d.filter(F.col("text").isNull()).count() == 0


def test_containment_shingle_k_single_source(spark, sf_dir):
    """ADVICE r7: numerator (_shingles) and denominator (_shingle_array)
    of q_dedup_containment must derive from ONE shingle width. Verify
    the constant exists AND that the two helpers agree under it on the
    live fixture: per-doc exploded-distinct-shingle count ==
    size(shingle array) for every document."""
    from oke_cassandra_spark_locality_demo_spark.llm.dedup import (
        CONTAINMENT_SHINGLE_K,
        _shingle_array,
        _shingles,
    )
    from oke_cassandra_spark_locality_demo_spark.sources.ingest import load

    d = load(spark, sf_dir, "documents")
    exploded = (
        _shingles(d, CONTAINMENT_SHINGLE_K)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mapped = d.select(
        "doc_id",
        F.size(_shingle_array(CONTAINMENT_SHINGLE_K)).cast("long").alias("m"),
    )
    # Full outer join (ADVICE r8): an inner join would drop documents
    # that produce zero shingles — present only in `mapped` — which is
    # exactly the degenerate case (size() returning 0 or -1 while the
    # exploded form emits nothing) this test exists to pin.
    mismatches = (
        exploded.join(mapped, "doc_id", "full_outer")
        .filter(
            F.coalesce(F.col("n"), F.lit(0))
            != F.coalesce(F.col("m"), F.lit(0))
        )
        .count()
    )
    assert mismatches == 0


def test_simhash_band_params_consistent(spark, sf_dir):
    """Banding geometry invariants (VERDICT r5 item 3): bands tile the
    fingerprint exactly, the pigeonhole recall guarantee covers d ≤
    NBANDS−1, and the fixture's worst band-bucket occupancy sits far
    below SIMHASH_BUCKET_CAP so the fan-out guard drops nothing at
    test scale."""
    from oke_cassandra_spark_locality_demo_spark.llm.dedup import (
        SIMHASH_BAND_WIDTH,
        SIMHASH_BITS,
        SIMHASH_BUCKET_CAP,
        SIMHASH_HAMMING_MAX,
        SIMHASH_NBANDS,
    )

    assert SIMHASH_NBANDS * SIMHASH_BAND_WIDTH == SIMHASH_BITS
    assert SIMHASH_NBANDS - 1 <= SIMHASH_HAMMING_MAX
    # cap must dominate fixture occupancy by orders of magnitude; the
    # expected occupancy at fixture scale is n_docs / 2^W per band
    from oke_cassandra_spark_locality_demo_spark.sources.ingest import load

    n_docs = load(spark, sf_dir, "documents").count()
    expected_occ = n_docs / (1 << SIMHASH_BAND_WIDTH)
    assert expected_occ * 100 <= SIMHASH_BUCKET_CAP, (
        f"expected bucket occupancy {expected_occ} at {n_docs} docs "
        f"leaves no headroom under cap {SIMHASH_BUCKET_CAP}"
    )


def test_lsh_knn_recall(spark, sf_dir):
    """Multi-probe sign-LSH recall vs exact top-k. Uniform random vectors
    are LSH's worst case (no cluster structure) — expected recall with
    hamming-1 probing of 4 planes is ≈0.55; assert a conservative 0.25."""
    exact = {
        (r["query_id"], r["cand_id"])
        for r in get("q_sim_knn_exact").fn(spark, sf_dir).collect()
    }
    approx_rows = get("q_sim_lsh").fn(spark, sf_dir).collect()
    approx = {(r["query_id"], r["cand_id"]) for r in approx_rows}
    assert approx, "LSH returned nothing"
    # hard non-emptiness (vacuousness audit, r9): knn_exact is top-k
    # over a never-empty embeddings fixture — empty means it regressed
    assert exact, "exact knn baseline is empty"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.25, f"recall={recall}"


def test_ivf_recall(spark, sf_dir):
    """IVF (k-means quantizer, 4/16 cells probed) recall vs exact top-k
    — ≈0.56 on uniform random vectors at sf0.001; assert ≥0.3."""
    exact = {
        (r["query_id"], r["cand_id"])
        for r in get("q_sim_knn_exact").fn(spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["cand_id"])
        for r in get("q_sim_ivf").fn(spark, sf_dir).collect()
    }
    assert ivf, "IVF returned nothing"
    assert exact, "exact knn baseline is empty"
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.3, f"recall={recall}"


def test_pq_recall(spark, sf_dir):
    """PQ-ADC + exact refinement (8×16 codebooks, 64× compression,
    R=8k shortlist) recall vs exact top-k — measured 0.64 @ sf0.01 /
    0.56 @ sf0.1 on near-random unit vectors (PQ's worst case); assert
    the audit bound ≥0.4, and that every emitted pair survives the
    exact-cosine re-rank (cosine present and within [-1, 1])."""
    exact = {
        (r["query_id"], r["cand_id"])
        for r in get("q_sim_knn_exact").fn(spark, sf_dir).collect()
    }
    pq_rows = get("q_sim_pq").fn(spark, sf_dir).collect()
    pq = {(r["query_id"], r["cand_id"]) for r in pq_rows}
    assert pq, "PQ returned nothing"
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in pq_rows), pq_rows[:5]
    assert exact, "exact knn baseline is empty"
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.4, f"recall={recall}"


def test_hll_within_rsd(spark, sf_dir):
    """The query itself carries the verdict (derived-oracle pattern):
    every group's sketch estimate must sit within 5·rsd of exact, and a
    direct re-computation of the estimate must agree within 10%."""
    from oke_cassandra_spark_locality_demo_spark.catalog import load

    rows = get("q_agg_approx_distinct").fn(spark, sf_dir).collect()
    assert rows and all(r["within_rsd"] for r in rows), rows
    est = {
        r["l_returnflag"]: r["a"]
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a"))
        .collect()
    }
    for r in rows:
        err = abs(est[r["l_returnflag"]] - r["exact_orders"]) / max(r["exact_orders"], 1)
        assert err <= 0.1, f"{r['l_returnflag']}: err={err}"


def test_multimodal_stub_plumbing(spark, sf_dir):
    """The binary pipeline preserves row count and produces typed
    features for every media row."""
    from oke_cassandra_spark_locality_demo_spark.llm.multimodal import media_table

    media = media_table(spark, sf_dir)
    feats = get("q_multimodal_binary").fn(spark, sf_dir)
    assert feats.count() == media.count()
    assert feats.filter(F.col("feat_mean").isNull()).count() == 0


def test_hll_sketch_rollup_close_to_exact(spark, sf_dir):
    """Daily-sketch → monthly-union estimates must land within 5% of the
    exact per-month distinct user count (lgK default 12 ⇒ rsd ≈ 1.6%)."""
    from oke_cassandra_spark_locality_demo_spark.catalog import load

    rows = get("q_agg_sketch_hll").fn(spark, sf_dir).collect()
    assert rows, "no monthly sketches produced"
    assert all(r["within_rsd"] for r in rows), rows
    ev = load(spark, sf_dir, "events")
    month = F.date_trunc("month", "ts").cast("timestamp_ntz").alias("month")
    approx = {
        r["month"]: r["a"]
        for r in ev.groupBy(month, F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("month")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("a"))
        .collect()
    }
    assert {r["month"] for r in rows} == set(approx)
    for r in rows:
        err = abs(approx[r["month"]] - r["exact_users"]) / max(r["exact_users"], 1)
        assert err <= 0.05, f"{r['month']}: err={err}"


def test_knn_blas_probe_cap_raises(spark, sf_dir, monkeypatch):
    """The BLAS kNN driver-side probe materialization is hard-capped:
    past MAX_PROBES it must RAISE, never silently pull a
    corpus-proportional block through the driver (VERDICT r3 item 5)."""
    import pytest

    from oke_cassandra_spark_locality_demo_spark.llm import similarity

    monkeypatch.setattr(similarity, "MAX_PROBES", 2)
    with pytest.raises(ValueError, match="MAX_PROBES"):
        get("q_sim_knn_blas").fn(spark, sf_dir)


def test_ngram_memo_bounded_and_reused(spark, sf_dir):
    """The dedup index memo is one slot PER VARIANT: repeat invocations
    on the same (session, corpus) reuse the SAME cached DataFrames, and
    no variant ever holds more than one corpus index (ADVICE r3: the
    former bare .cache() leaked per call; r5 extended the memo from the
    jaccard variant to prefix/minhash)."""
    from oke_cassandra_spark_locality_demo_spark.llm import dedup

    def jaccard_slots():
        return {
            k: v for k, v in dedup._NGRAM_MEMO.items() if k[-1] == "jaccard"
        }

    get("q_dedup_ngram_jaccard").fn(spark, sf_dir)
    assert len(jaccard_slots()) == 1
    (docs1, cand1) = next(iter(jaccard_slots().values()))
    get("q_dedup_ngram_jaccard").fn(spark, sf_dir)
    assert len(jaccard_slots()) == 1
    (docs2, cand2) = next(iter(jaccard_slots().values()))
    assert docs1 is docs2 and cand1 is cand2, "memo was not reused"
    # cross-variant isolation: other variants keep at most one slot too
    get("q_dedup_ngram_prefix").fn(spark, sf_dir)
    get("q_dedup_ngram_prefix").fn(spark, sf_dir)
    per_variant: dict = {}
    for k in dedup._NGRAM_MEMO:
        per_variant[k[-1]] = per_variant.get(k[-1], 0) + 1
    assert all(v == 1 for v in per_variant.values()), per_variant


def test_ivf_training_sample_guards(spark, sf_dir):
    """IVF quantizer training must never seed fewer centroids than k
    (ADVICE r3: an integer-truncated sampling threshold could yield an
    empty training sample at ~5e10 rows and crash at centroids[0])."""
    import pytest

    from pyspark.sql import functions as F

    from oke_cassandra_spark_locality_demo_spark.catalog import load
    from oke_cassandra_spark_locality_demo_spark.llm.ivf import (
        K_CELLS,
        kmeans_centroids,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    tiny = emb.limit(max(2, K_CELLS // 4))
    with pytest.raises(ValueError, match="training sample"):
        kmeans_centroids(tiny, k=K_CELLS, iters=1)


def test_dedup_span_merges_intervals(spark):
    """Hand-built corpus for the span semantics the fixture can't show:
    two docs sharing two 8-word phrases separated by unique filler must
    report TWO spans of 8 tokens each; two docs sharing a contiguous
    16-word prefix must merge the overlapping gram intervals into ONE
    16-token span."""
    from oke_cassandra_spark_locality_demo_spark.llm.dedup import duplicated_spans

    p1 = " ".join(f"p{i}" for i in range(8))
    p2 = " ".join(f"q{i}" for i in range(8))
    fill = lambda tag: " ".join(f"{tag}{i}" for i in range(10))  # noqa: E731
    docs = spark.createDataFrame(
        [
            (100, f"{p1} {fill('a')} {p2}"),
            (101, f"{p1} {fill('b')} {p2}"),
            (102, f"{p1} {p2} {fill('c')}"),
            (103, f"{p1} {p2} {fill('d')}"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["dup_tokens"], r["n_spans"], r["max_span_tokens"]
        )
        for r in duplicated_spans(docs).collect()
    }
    # docs 100/101: spans [0..7] and [18..25] -> 16 dup tokens, 2 spans
    assert got[100] == (26, 16, 2, 8)
    assert got[101] == (26, 16, 2, 8)
    # docs 102/103: grams at pos 0..8 all duplicated -> one merged span
    # covering tokens [0..15]
    assert got[102] == (26, 16, 1, 16)
    assert got[103] == (26, 16, 1, 16)


def test_multimodal_resize_binary_plumbing(spark, sf_dir):
    """The resize worker must emit a real BINARY column of exactly
    _RESIZE_TARGET bytes per image (the graded projection drops it, so
    pin it here), with the checksum equal to the sum of those bytes."""
    from oke_cassandra_spark_locality_demo_spark.llm.multimodal import (
        _RESIZE_TARGET,
        RESIZE_SCHEMA,
        media_table,
        resize_media,
    )

    media = media_table(spark, sf_dir).filter(F.col("media_type") == "image/png")
    rows = media.mapInPandas(resize_media, schema=RESIZE_SCHEMA).limit(20).collect()
    assert rows
    for r in rows:
        assert len(r["resized"]) == _RESIZE_TARGET
        assert sum(r["resized"]) == r["resized_checksum"]
        assert r["resized"][0] == r["first_byte"]
        assert r["resized"][-1] == r["last_byte"]


def test_quant_memo_bounded_and_reused(spark, sf_dir):
    """Trained-quantizer memo: a second q_sim_ivf invocation must reuse
    the trained centroids (identical object), and the FIFO bound must
    hold as distinct keys churn."""
    from oke_cassandra_spark_locality_demo_spark.llm import ivf

    ivf._QUANT_MEMO.clear()
    get("q_sim_ivf").fn(spark, sf_dir).count()
    # r5: the key carries hyperparameters + a corpus fingerprint
    # (ADVICE r4 — a retuned caller or regenerated fixture must miss)
    key = ivf.quant_key(
        spark, sf_dir, "ivf",
        k=ivf.K_CELLS, iters=ivf.N_ITERS, cap=ivf.TRAIN_CAP,
    )
    assert key in ivf._QUANT_MEMO
    first = ivf._QUANT_MEMO[key]
    get("q_sim_ivf").fn(spark, sf_dir).count()
    assert ivf._QUANT_MEMO[key] is first  # reused, not retrained
    for i in range(ivf._QUANT_MEMO_SLOTS + 2):
        ivf.quant_memo(("app", f"dir{i}", "x"), lambda: [i])
    assert len(ivf._QUANT_MEMO) <= ivf._QUANT_MEMO_SLOTS


def test_quantizer_training_partition_invariant(spark, sf_dir):
    """The r4 decimal-sum conversion's point, tested directly: with the
    memo CLEARED between runs (the memo otherwise hides exactly this),
    k-means training under 5 vs 32 shuffle partitions must produce
    bit-identical centroids — a plain double F.sum here drifts with the
    partial-aggregation order (the r1-r3 driver-fail mechanism)."""
    from pyspark.sql import functions as F

    from oke_cassandra_spark_locality_demo_spark.catalog import load
    from oke_cassandra_spark_locality_demo_spark.llm.ivf import kmeans_centroids

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        outs = []
        for n_part in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            outs.append(kmeans_centroids(emb, iters=2))
        assert outs[0] == outs[1], "centroids drift with partitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_bpe_training_partition_invariant(spark, sf_dir):
    """BPE merge learning must not depend on the partition layout: the
    pair counts are exact integer sums and the argmax tie-breaks
    (count DESC, pair ASC), so training under 5 vs 32 shuffle
    partitions must produce the identical merge table — counts
    included."""
    from oke_cassandra_spark_locality_demo_spark.llm.bpe import train_bpe_merges

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        outs = []
        for n_part in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            outs.append(train_bpe_merges(spark, sf_dir, k=2))
        assert outs[0] == outs[1], "BPE merges drift with partitioning"
        assert len(outs[0]) == 2 and all(len(m) == 5 for m in outs[0])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_phash_banded_degree_equals_all_pairs(spark, sf_dir):
    """The pigeonhole completeness claim behind q_multimodal_phash: the
    banded candidate join must find EVERY pair within Hamming distance 3
    (4 bands × 16 bits ⇒ any d ≤ 3 pair shares a whole band). Verified
    independently of the DuckDB oracle by brute-forcing all fingerprint
    pairs driver-side and comparing per-doc degrees."""
    from itertools import combinations

    from oke_cassandra_spark_locality_demo_spark.registry import get

    rows = get("q_multimodal_phash").fn(spark, sf_dir).collect()
    fps = {r.doc_id: (r.b0, r.b1, r.b2, r.b3) for r in rows}
    deg = {doc_id: 0 for doc_id in fps}
    for a, b in combinations(sorted(fps), 2):
        d = sum(bin(x ^ y).count("1") for x, y in zip(fps[a], fps[b]))
        if d <= 3:
            deg[a] += 1
            deg[b] += 1
    got = {r.doc_id: r.n_near for r in rows}
    assert got == deg


def test_rrf_matches_python_reference(spark, sf_dir):
    """q_rank_rrf (r7-fronted) verified independently of the DuckDB
    oracle: re-derive the two rank maps from the already-cross-checked
    BM25/QL top-20 outputs driver-side, fuse with the textbook
    1/(60+rank) formula in Python, and require identical rows."""
    from decimal import ROUND_HALF_UP, Decimal

    bm = get("q_text_bm25").fn(spark, sf_dir).collect()
    ql = get("q_text_ql").fn(spark, sf_dir).collect()
    ra = {
        r.doc_id: i + 1
        for i, r in enumerate(sorted(bm, key=lambda r: (-r.bm25_e6, r.doc_id)))
    }
    rb = {
        r.doc_id: i + 1
        for i, r in enumerate(sorted(ql, key=lambda r: (-r.ql_e6, r.doc_id)))
    }
    expect = {}
    for d in set(ra) | set(rb):
        s = (1.0 / (60.0 + ra[d]) if d in ra else 0.0) + (
            1.0 / (60.0 + rb[d]) if d in rb else 0.0
        )
        e6 = int(
            Decimal(repr(s * 1000000.0)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        expect[d] = (ra.get(d, 0), rb.get(d, 0), e6)
    got = {
        r.doc_id: (r.rank_bm25, r.rank_ql, r.rrf_e6)
        for r in get("q_rank_rrf").fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_rank_eval_matches_python_reference(spark, sf_dir):
    """q_rank_eval (r7-fronted) verified against a from-scratch Python
    scorer: relevance recomputed from the raw document text (the
    conjunctive >= 3-occurrence criterion), metrics recomputed with
    plain integer arithmetic over the BM25 top-20."""
    from oke_cassandra_spark_locality_demo_spark.catalog import load
    from oke_cassandra_spark_locality_demo_spark.llm.text import BM25_QUERY

    bm = get("q_text_bm25").fn(spark, sf_dir).collect()
    rnk = {
        r.doc_id: i + 1
        for i, r in enumerate(sorted(bm, key=lambda r: (-r.bm25_e6, r.doc_id)))
    }
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    rel = set()
    for r in docs:
        words = r.text.lower().strip().split(" ")
        if all(words.count(t) >= 3 for t in BM25_QUERY):
            rel.add(r.doc_id)
    hit_ranks = sorted(rnk[d] for d in rel if d in rnk)
    hits5 = sum(1 for k in hit_ranks if k <= 5)
    hits10 = sum(1 for k in hit_ranks if k <= 10)
    hits20 = len(hit_ranks)
    expect = {
        "n_rel": len(rel),
        "hits5": hits5,
        "hits10": hits10,
        "hits20": hits20,
        "p5_e6": hits5 * 200000,
        "p10_e6": hits10 * 100000,
        "recall20_e6": hits20 * 1000000 // len(rel) if rel else 0,
        "mrr_e6": (1000000 // hit_ranks[0]) if hit_ranks else 0,
    }
    (row,) = get("q_rank_eval").fn(spark, sf_dir).collect()
    got = {k: row[k] for k in expect}
    assert got == expect


def test_gopher_rules_match_python_reference(spark, sf_dir):
    """q_quality_gopher (r8/r9 block): the five rule bits recomputed
    per document from raw text in plain Python (milli-ratios with
    half-up rounding, truncating symbol count), bitmask and keep flag
    compared row-for-row."""
    import re
    from decimal import ROUND_HALF_UP, Decimal

    from oke_cassandra_spark_locality_demo_spark.catalog import load
    from oke_cassandra_spark_locality_demo_spark.llm.text import _STOPWORDS

    def half_up(v):
        return int(
            Decimal(repr(v)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expect = {}
    for r in docs:
        norm = r.text.lower().strip()
        words = norm.split(" ")
        n_words = len(words)
        chars = len(norm.replace(" ", ""))
        mean_wlen = half_up(chars * 1000.0 / n_words)
        n_alpha = sum(1 for w in words if re.fullmatch(r"[a-z]+", w))
        alpha = half_up(n_alpha * 1000.0 / n_words)
        stops = sum(1 for w in words if w in set(_STOPWORDS))
        n3 = len(re.findall(r"\.\.\.", norm))
        sym = int(norm.count("#") + (3 * n3) / 3.0)
        bits = (
            (1 if 20 <= n_words <= 500 else 0)
            + (2 if 3000 <= mean_wlen <= 10000 else 0)
            + (4 if alpha >= 800 else 0)
            + (8 if stops >= 2 else 0)
            + (16 if sym * 10 < n_words else 0)
        )
        expect[r.doc_id] = (n_words, mean_wlen, alpha, stops, bits,
                            bits == 31)
    got = {
        r.doc_id: (r.n_words, r.mean_wlen_milli, r.alpha_milli, r.stop_hits,
                   r.rules, r.keep)
        for r in get("q_quality_gopher").fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_dedup_priority_matches_python_reference(spark, sf_dir):
    """q_dedup_priority (r8/r9 block): the provenance-aware canonical
    choice (tier = int(source[3:]) % 3, then doc_id) re-derived with a
    plain Python group-min per normalized text."""
    from oke_cassandra_spark_locality_demo_spark.catalog import load

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    groups: dict = {}
    for r in docs:
        tier = int(r.source[3:]) % 3
        key = r.text.lower().strip()
        g = groups.setdefault(key, [])
        g.append((tier, r.doc_id, r.source))
    expect = {}
    for g in groups.values():
        tier, doc_id, source = min(g)
        expect[doc_id] = (source, tier, len(g))
    got = {
        r.doc_id: (r.source, r.tier, r.n_dups)
        for r in get("q_dedup_priority").fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_corpus_card_matches_python_reference(spark, sf_dir):
    """q_corpus_card (r8/r9 block): every card column recomputed from
    raw documents driver-side — counts, distinct langs/texts, the
    integer quality gate, ceil-quarter BPE estimate, half-up dup ppm."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from oke_cassandra_spark_locality_demo_spark.catalog import load

    docs = (
        load(spark, sf_dir, "documents")
        .select("source", "lang", "text")
        .collect()
    )
    per: dict = {}
    for r in docs:
        norm = r.text.lower().strip()
        words = norm.split(" ")
        nw, nu = len(words), len(set(words))
        s = per.setdefault(
            r.source, {"n": 0, "langs": set(), "texts": set(), "q": 0, "bpe": 0}
        )
        s["n"] += 1
        s["langs"].add(r.lang)
        s["texts"].add(norm)
        s["q"] += 1 if (20 <= nw <= 1000 and nu * 10 >= nw * 3) else 0
        s["bpe"] += math.ceil(len(r.text) / 4.0)
    expect = {}
    for src, s in per.items():
        dup = int(
            Decimal(
                repr((s["n"] - len(s["texts"])) * 1000000.0 / s["n"])
            ).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )
        expect[src] = (
            s["n"], len(s["langs"]), len(s["texts"]), dup, s["bpe"], s["q"]
        )
    got = {
        r.source: (r.n_docs, r.n_langs, r.n_distinct_texts, r.dup_ppm,
                   r.total_bpe_tokens, r.n_quality_keep)
        for r in get("q_corpus_card").fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_ppl_band_rank_and_keep_self_consistent(spark, sf_dir):
    """q_sample_ppl_band (r8/r9 block): the emission is
    self-certifying — per language the ranks must be the permutation
    induced by (ce_milli, doc_id) over the full per-language emission,
    and keep exactly the 10-90% integer band test."""
    rows = get("q_sample_ppl_band").fn(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        n = len(rs)
        order = sorted(rs, key=lambda r: (r.ce_milli, r.doc_id))
        assert [r.rn for r in order] == list(range(1, n + 1)), lang
        for r in rs:
            assert r.keep == (10 * r.rn > n and 10 * r.rn <= 9 * n), r


def test_split_leakage_matches_bruteforce(spark, sf_dir):
    """q_split_leakage (r8/r9 block) brute-forced end-to-end: the
    md5-prefix split, distinct 3-shingle sets, all eval x train Jaccard
    pairs at the 0.6 threshold, per-doc dup count and worst ppm — all
    recomputed in plain Python."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from oke_cassandra_spark_locality_demo_spark.catalog import load

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )

    def shingles(text):
        words = text.lower().strip().split(" ")
        if len(words) < 3:
            return {" ".join(words)}
        return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}

    def split_of(source):
        p = hashlib.md5(source.encode()).hexdigest()[:2]
        return "train" if p < "cc" else ("val" if p < "e6" else "test")

    train, evals = [], []
    for r in docs:
        entry = (r.doc_id, shingles(r.text), split_of(r.source))
        (train if entry[2] == "train" else evals).append(entry)
    expect = {}
    for eid, se, sp in evals:
        n_dups, worst = 0, None
        for tid, st, _ in train:
            common = len(se & st)
            denom = len(se) + len(st) - common
            if denom and common / denom >= 0.6:
                n_dups += 1
                ppm = int(
                    Decimal(repr(common * 1000000.0 / denom)).quantize(
                        Decimal("1"), rounding=ROUND_HALF_UP
                    )
                )
                worst = ppm if worst is None else max(worst, ppm)
        if n_dups:
            expect[eid] = (sp, n_dups, worst)
    got = {
        r.doc_id: (r.split, r.n_train_dups, r.max_jac_ppm)
        for r in get("q_split_leakage").fn(spark, sf_dir).collect()
    }
    assert got == expect


def _py_shingles(text, k=3):
    words = text.lower().strip().split(" ")
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def test_boilerplate_matches_python_reference(spark, sf_dir):
    """q_text_boilerplate (r8/r9 block): gram document frequencies and
    the relative boilerplate threshold (df >= 4 AND df*200 >= N_docs)
    re-derived from raw text; per-doc counts, half-up ppm, and the keep
    cut compared row-for-row."""
    from decimal import ROUND_HALF_UP, Decimal

    from oke_cassandra_spark_locality_demo_spark.catalog import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    n_docs = len(docs)
    sets = {r.doc_id: _py_shingles(r.text) for r in docs}
    df: dict = {}
    for s in sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    expect = {}
    for doc_id, s in sets.items():
        n_grams = len(s)
        n_boiler = sum(
            1 for g in s if df[g] >= 4 and df[g] * 200 >= n_docs
        )
        ppm = int(
            Decimal(repr(n_boiler * 1000000.0 / n_grams)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        expect[doc_id] = (n_grams, n_boiler, ppm, n_boiler * 10 < n_grams)
    got = {
        r.doc_id: (r.n_grams, r.n_boiler, r.boiler_ppm, r.keep)
        for r in get("q_text_boilerplate").fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_novelty_matches_python_reference(spark, sf_dir):
    """q_text_novelty (r8/r9 block): df-1 shingle shares recomputed at
    STRING granularity (the engine's 64-bit hash keys must behave
    collision-free on the fixture for the oracle to have ever
    matched)."""
    from decimal import ROUND_HALF_UP, Decimal

    from oke_cassandra_spark_locality_demo_spark.catalog import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sets = {r.doc_id: _py_shingles(r.text) for r in docs}
    df: dict = {}
    for s in sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    expect = {}
    for doc_id, s in sets.items():
        n_unique = sum(1 for g in s if df[g] == 1)
        ppm = int(
            Decimal(repr(n_unique * 1000000.0 / len(s))).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        expect[doc_id] = (len(s), n_unique, ppm)
    got = {
        r.doc_id: (r.n_shingles, r.n_unique, r.novelty_ppm)
        for r in get("q_text_novelty").fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_incremental_fuzzy_matches_bruteforce(spark, sf_dir):
    """q_dedup_incremental_fuzzy (r8/r9 block) brute-forced: every
    (batch, history) pair with 3-shingle Jaccard >= 0.6 enumerated
    naively in Python — the PPJoin prefix filter must lose nothing and
    the raw int-ratio jaccard must agree bit-for-bit."""
    from oke_cassandra_spark_locality_demo_spark.catalog import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    batch = [(r.doc_id, _py_shingles(r.text)) for r in docs if r.doc_id % 10 == 0]
    hist = [(r.doc_id, _py_shingles(r.text)) for r in docs if r.doc_id % 10 != 0]
    expect = {}
    for nid, sb in batch:
        for hid, sh in hist:
            common = len(sb & sh)
            denom = len(sb) + len(sh) - common
            if denom and common / denom >= 0.6:
                expect[(nid, hid)] = common / denom
    got = {
        (r.new_id, r.dup_of): r.jaccard
        for r in get("q_dedup_incremental_fuzzy").fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_embedding_cosine_matches_numpy(spark, sf_dir):
    """q_dedup_embedding returns 0 rows at EVERY fixture SF (no
    same-label pair reaches cosine 0.95) — a true empty that was
    adjudicated as 0=0, which a sign-flipped or mis-normalized cosine
    could hide behind. Run the identical pair pipeline UNTHRESHOLDED
    and check every same-label pair's cosine against an independent
    Python left-fold (the same in-order double arithmetic the Spark
    aggregate and the DuckDB oracle use), then pin the fixture's max
    cosine below the registered threshold so the key's empty result is
    proven true, not vacuous-by-bug."""
    from collections import defaultdict

    import duckdb

    from oke_cassandra_spark_locality_demo_spark.llm.dedup import (
        _embedding_cosine_pairs,
    )

    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in _embedding_cosine_pairs(spark, sf_dir, -1.0).collect()
    }
    assert got, "unthresholded pipeline emitted no pairs"

    rows = duckdb.sql(
        f"SELECT vec_id, label, CAST(embedding AS DOUBLE[]) "
        f"FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    by_label = defaultdict(list)
    for vec_id, label, v in rows:
        by_label[label].append((vec_id, v))

    def fold_dot(x, y):
        acc = 0.0
        for p, q in zip(x, y):
            acc = acc + p * q
        return acc

    # Guard before dividing (ADVICE r8): a regenerated fixture holding a
    # zero embedding would otherwise crash the reference fold with
    # ZeroDivisionError instead of failing with a named invariant.
    for _, vecs in by_label.items():
        for vec_id, v in vecs:
            assert fold_dot(v, v) > 0, (
                f"fixture embedding {vec_id} has zero norm — the cosine "
                "reference below is undefined for it; regenerate or pin"
            )

    want = {}
    for label, vecs in by_label.items():
        for i, (ida, va) in enumerate(vecs):
            for idb, vb in vecs:
                if ida < idb:
                    want[(ida, idb)] = fold_dot(va, vb) / (
                        fold_dot(va, va) ** 0.5 * fold_dot(vb, vb) ** 0.5
                    )
    assert set(got) == set(want), "blocked pair set differs"
    worst = max(abs(got[k] - want[k]) for k in want)
    assert worst < 1e-6, f"cosine mismatch up to {worst}"
    # the registered key's empty result is the true answer
    assert max(want.values()) < 0.95, (
        "fixture now holds a >=0.95 pair — q_dedup_embedding is no "
        "longer expected to be empty; update this pin"
    )


def test_pack_sequences_matches_bruteforce(spark, sf_dir):
    """q_pack_sequences brute-forced: the next-fit-with-spill packing
    recomputed as the literal sequential fold it stands in for — walk
    each source's documents in doc_id order keeping a running token
    cursor; bin_id = cursor // budget, bin_offset = cursor % budget,
    cursor += ceil(len(text)/4). The operator expresses this as ONE
    window prefix-sum (no driver loop); this test pins that the
    window formulation IS the sequential semantics, independently of
    the DuckDB oracle (which shares the prefix-sum formulation and so
    could share a formulation bug). Also pins the packing invariants:
    0 <= bin_offset < budget, and bin_id nondecreasing per source."""
    import math

    from oke_cassandra_spark_locality_demo_spark.catalog import load
    from oke_cassandra_spark_locality_demo_spark.llm.pipeline import (
        _PACK_BUDGET,
        q_pack_sequences,
    )

    docs = sorted(
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect(),
        key=lambda r: (r.source, r.doc_id),
    )
    assert docs, "fixture returned no documents"

    expect = {}
    cursor_by_source: dict[str, int] = {}
    for r in docs:
        n_tokens = math.ceil(len(r.text) / 4)
        cursor = cursor_by_source.get(r.source, 0)
        expect[(r.doc_id, r.source)] = (
            n_tokens, cursor // _PACK_BUDGET, cursor % _PACK_BUDGET
        )
        cursor_by_source[r.source] = cursor + n_tokens

    got_rows = q_pack_sequences(spark, sf_dir).collect()
    assert len(got_rows) == len(expect)
    last_bin: dict[str, int] = {}
    for r in sorted(got_rows, key=lambda r: (r.source, r.doc_id)):
        assert (r.n_tokens, r.bin_id, r.bin_offset) == expect[
            (r.doc_id, r.source)
        ], (r.doc_id, r.source)
        assert 0 <= r.bin_offset < _PACK_BUDGET, r.doc_id
        assert r.bin_id >= last_bin.get(r.source, 0), r.doc_id
        last_bin[r.source] = r.bin_id


def test_split_train_test_matches_bruteforce(spark, sf_dir):
    """q_split_train_test and its oracle share the md5(source)-prefix
    threshold formulation; recompute the whole audit in plain Python —
    split assignment per source, per-(split, lang) doc and distinct-
    source counts, and the share as the same single IEEE division of
    exact longs — and require exact equality. Also pins the leakage
    invariant the operator exists for: every source maps to exactly
    one split."""
    import hashlib

    from oke_cassandra_spark_locality_demo_spark.catalog import load
    from oke_cassandra_spark_locality_demo_spark.llm.pipeline import (
        q_split_train_test,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    ).collect()
    assert docs

    def split_of(source: str) -> str:
        p = hashlib.md5(source.encode()).hexdigest()[:2]
        return "train" if p < "cc" else ("val" if p < "e6" else "test")

    counts: dict[tuple, int] = {}
    sources: dict[tuple, set] = {}
    for r in docs:
        k = (split_of(r.source), r.lang)
        counts[k] = counts.get(k, 0) + 1
        sources.setdefault(k, set()).add(r.source)
    total = len(docs)
    expect = {
        k: (n, len(sources[k]), n / total) for k, n in counts.items()
    }

    got_rows = q_split_train_test(spark, sf_dir).collect()
    got = {
        (r.split, r.lang): (r.docs, r.sources, r.share) for r in got_rows
    }
    assert got == expect

    # leakage invariant: a source appears under exactly one split
    seen: dict[str, str] = {}
    for r in docs:
        s = split_of(r.source)
        assert seen.setdefault(r.source, s) == s, r.source


class TestStarvationHardening:
    """VERDICT r10 item 3: the shingle-explosion dedup family must
    survive the execution-memory starvation extreme
    (spark.memory.fraction=0.05) that previously fail-stopped 8 keys.
    The fix is memory-aware physical planning (_stage_barrier/_pin):
    identity at normal memory, DISK_ONLY materialization +
    low-parallelism stages under starvation. The full-family
    starvation sweep runs via tools/drive_subset.py (recorded in
    SCALING.md); these tests pin the helper semantics cheaply."""

    def test_barrier_is_identity_at_normal_memory(self, spark, sf_dir):
        from oke_cassandra_spark_locality_demo_spark.llm import dedup

        assert not dedup._exec_memory_starved(spark)
        df = dedup.load(spark, sf_dir, "documents").select("doc_id")
        out = dedup._stage_barrier(df)
        assert out is df, "normal-memory plans must be untouched"

    def test_pin_caches_at_normal_memory(self, spark, sf_dir):
        from pyspark import StorageLevel

        from oke_cassandra_spark_locality_demo_spark.llm import dedup

        df = dedup.load(spark, sf_dir, "documents").select("doc_id")
        pinned = dedup._pin(df)
        try:
            assert pinned.storageLevel.useMemory
        finally:
            pinned.unpersist(blocking=True)

    def test_starved_detection_reads_memory_fraction(self, spark):
        from oke_cassandra_spark_locality_demo_spark.llm import dedup

        # the live test session runs at the 0.6 default
        assert dedup._exec_memory_starved(spark) is False

    def test_starved_results_identical_in_subprocess(self):
        """The starved physical plan must return byte-identical rows:
        drive the one oracle-backed key with the deepest barrier
        stack (q_dedup_ngram_jaccard) under fraction=0.05 through the
        same cross-engine compare the external driver uses."""
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "drive_subset.py"),
             "--conf", "spark.memory.fraction=0.05",
             "q_dedup_ngram_jaccard", "q_dedup_containment"],
            capture_output=True, text=True, timeout=600,
            env={**os.environ, "PYTHONDONTWRITEBYTECODE": "1"},
        )
        assert proc.returncode == 0, (proc.stdout[-800:], proc.stderr[-800:])
        assert "2/2 green" in proc.stdout, proc.stdout[-400:]


class TestRealImageDecode:
    """VERDICT r10 item 4: the last declared-but-stubbed tier made
    real. The pure-stdlib PNG codec must round-trip exactly, reverse
    all five spec filter types, and reject streams outside its
    declared subset loudly; the registered query is cross-engine
    verified by the driver (oracle states the decoded stats
    closed-form)."""

    def test_codec_round_trip(self):
        import random

        from oke_cassandra_spark_locality_demo_spark.llm.png_codec import (
            decode_png,
            encode_png,
        )

        rng = random.Random(11)
        for _ in range(5):
            w, h = rng.randint(1, 40), rng.randint(1, 30)
            rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
            assert decode_png(encode_png(w, h, rgb)) == (w, h, rgb)

    def test_decoder_reverses_all_five_filters(self):
        """Hand-encode scanlines with filters 0-4 (the encoder itself
        only emits 0) so an externally-produced baseline PNG — e.g.
        Pillow's filtered output — would decode identically."""
        import struct
        import zlib

        from oke_cassandra_spark_locality_demo_spark.llm.png_codec import (
            _paeth,
            decode_png,
        )

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

        w, h = 5, 6
        rgb = bytes((x * 17 + y * 29 + c * 41) % 256
                    for y in range(h) for x in range(w) for c in range(3))
        stride = w * 3
        prev = bytes(stride)
        raw = bytearray()
        for y in range(h):
            line = rgb[y * stride:(y + 1) * stride]
            ftype = y % 5
            raw.append(ftype)
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                up = prev[i]
                ul = prev[i - 3] if i >= 3 else 0
                pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1,
                        4: _paeth(left, up, ul)}[ftype]
                raw.append((line[i] - pred) & 0xFF)
            prev = line
        data = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        assert decode_png(data) == (w, h, rgb)

    def test_decoder_rejects_unsupported_subset(self):
        import struct
        import zlib

        import pytest

        from oke_cassandra_spark_locality_demo_spark.llm.png_codec import (
            decode_png,
        )

        with pytest.raises(ValueError, match="signature"):
            decode_png(b"GIF89a" + b"\x00" * 20)

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

        # grayscale (color type 0) is outside the declared subset
        bad = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
               + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="unsupported"):
            decode_png(bad)

    def test_decode_real_query_matches_closed_form(self, spark, sf_dir):
        from oke_cassandra_spark_locality_demo_spark.registry import get

        rows = get("q_multimodal_decode_real").fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            w, h = 8 + r.doc_id % 5, 8 + r.doc_id % 3
            assert (r.width, r.height, r.n_px) == (w, h, w * h)
            assert r.row0_red_sum == sum(
                (r.doc_id * 31 + x * 7) % 256 for x in range(w)
            )

    # ---- checked-in foreign-shaped fixtures (VERDICT r11 item 4) ----
    # The fixtures in tests/fixtures/png/ were produced by
    # tools/make_png_fixtures.py — a forward-filter implementation
    # transcribed INDEPENDENTLY from W3C PNG §9 (its own Paeth, its own
    # byte layout; zero shared code with the decoder) — and exercise
    # what the repo encoder never emits: fixed filters 1-4, an
    # ADAPTIVE (MSAD-heuristic, the libpng/Pillow rule) per-row filter
    # mix, multi-IDAT splits at awkward byte boundaries, and
    # interspersed ancillary chunks. sha256 pins keep the static bytes
    # honest: neither the decoder nor the generator can drift to match
    # a bug in the other without this test surfacing the change.

    _FIXTURE_DIR = (
        pathlib.Path(__file__).resolve().parent / "fixtures" / "png"
    )

    @staticmethod
    def _lattice(width, height):
        # independent re-derivation of make_png_fixtures.lattice
        return bytes(
            (x * 31 + y * 57 + c * 97 + x * y) % 256
            for y in range(height)
            for x in range(width)
            for c in range(3)
        )

    @staticmethod
    def _lattice_adaptive(width, height):
        # independent re-derivation of make_png_fixtures.lattice_adaptive
        def px(x, y, c):
            r = y % 4
            if r == 0:
                return (x * 37 + c * 11) % 256
            if r == 1:
                return (x * 37 + c * 11 + 3) % 256
            if r == 2:
                return (
                    x * 149 + y * 211 + c * 83 + (x * y * c + 7) ** 2
                ) % 256
            return (y * 5) % 256

        return bytes(
            px(x, y, c)
            for y in range(height)
            for x in range(width)
            for c in range(3)
        )

    def test_foreign_filtered_fixtures_decode_byte_exact(self):
        import hashlib
        import json

        from oke_cassandra_spark_locality_demo_spark.llm.png_codec import (
            decode_png,
        )

        manifest = json.loads(
            (self._FIXTURE_DIR / "manifest.json").read_text()
        )
        assert len(manifest) == 6
        filters_seen = set()
        for name, info in sorted(manifest.items()):
            data = (self._FIXTURE_DIR / name).read_bytes()
            assert hashlib.sha256(data).hexdigest() == info["sha256"], (
                f"{name}: checked-in fixture bytes drifted"
            )
            w, h, px = decode_png(data)
            assert (w, h) == (info["width"], info["height"]), name
            ref = (
                self._lattice_adaptive(w, h)
                if name.startswith("adaptive")
                else self._lattice(w, h)
            )
            assert px == ref, f"{name}: decoded lattice mismatch"
            filters_seen.update(info["filters"])
        # the corpus must exercise every nontrivial filter type
        assert {1, 2, 3, 4} <= filters_seen

    def test_adaptive_fixture_exercises_mixed_filters_and_idat_splits(self):
        import json
        import struct

        manifest = json.loads(
            (self._FIXTURE_DIR / "manifest.json").read_text()
        )
        info = manifest["adaptive_msad.png"]
        # per-row filter choice genuinely varies (no degenerate corpus)
        assert len(set(info["filters"])) >= 3, info["filters"]
        # the stream really is multi-IDAT with ancillary chunks mixed in
        data = (self._FIXTURE_DIR / "adaptive_msad.png").read_bytes()
        tags, pos = [], 8
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tags.append(data[pos + 4 : pos + 8])
            pos += 12 + length
        assert tags.count(b"IDAT") >= 4, tags
        assert b"gAMA" in tags and b"tEXt" in tags, tags

    def test_paeth_case_hand_computed(self):
        """A 2x1-pixel-per-row case with every byte worked out by hand
        from the spec equations — independent of BOTH the codec and
        the fixture generator.

        Lattice (w=2, h=2, RGB): row0 = (10,20,30),(40,60,80)
                                 row1 = (15,25,35),(50,70,90)
        Row 0, filter 1 (Sub):  first pixel has no left -> raw bytes
          10,20,30; second: 40-10=30, 60-20=40, 80-30=50.
        Row 1, filter 4 (Paeth): first pixel a=0,c=0,b=row0 ->
          p=b so predictor=b: 15-10=5, 25-20=5, 35-30=5;
          second pixel a=(15,25,35), b=(40,60,80), c=(10,20,30):
          p=a+b-c=(45,65,85); |p-a|=30,40,50  |p-b|=5,5,5
          |p-c|=35,45,55 -> b wins each time: 50-40=10, 70-60=10,
          90-80=10.
        """
        import struct
        import zlib

        from oke_cassandra_spark_locality_demo_spark.llm.png_codec import (
            decode_png,
        )

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        raw = bytes(
            [1, 10, 20, 30, 30, 40, 50]  # row 0: Sub
            + [4, 5, 5, 5, 10, 10, 10]  # row 1: Paeth
        )
        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert decode_png(data) == (
            2,
            2,
            bytes([10, 20, 30, 40, 60, 80, 15, 25, 35, 50, 70, 90]),
        )

    def test_pillow_round_trip_when_available(self):
        """Upgrade-path guard: when a REAL third-party encoder is
        present (Pillow is guarded in as the production decode tier),
        its adaptively-filtered output must decode identically. Skips
        in this container (no image libs, documented)."""
        PIL_Image = pytest.importorskip("PIL.Image")
        import io

        from oke_cassandra_spark_locality_demo_spark.llm.png_codec import (
            decode_png,
        )

        w, h = 16, 11
        ref = self._lattice_adaptive(w, h)
        img = PIL_Image.frombytes("RGB", (w, h), ref)
        buf = io.BytesIO()
        img.save(buf, format="PNG", optimize=True)
        assert decode_png(buf.getvalue()) == (w, h, ref)


def test_starved_session_tuning_is_gated_and_idempotent(spark):
    """The starved path's session narrowing must never fire at normal
    memory (the live test session), and its bookkeeping must be
    per-app idempotent."""
    from oke_cassandra_spark_locality_demo_spark import memharden

    before = spark.conf.get("spark.sql.shuffle.partitions")
    assert memharden.starved_parts(spark) is None
    df = spark.range(10)
    assert memharden.stage_barrier(df) is df
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    app = spark.sparkContext.applicationId
    assert app not in memharden._TUNED_APPS
    # direct call is idempotent and reversible for the test session
    try:
        memharden._ensure_starved_session_tuning(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            memharden.STARVED_PARTS
        )
        memharden._ensure_starved_session_tuning(spark)  # no-op repeat
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        memharden._TUNED_APPS.discard(app)


class TestGeneralizedPrefixFilter:
    """r12: the second-decade probe measured the k=1 prefix filter
    superlinear on a SATURATED shingle space (q_dedup_ngram_prefix
    x89.7 over sf0.1 -> sf1 on the fixture's 31-word vocab). The fix is
    a corpus-adaptive generalized prefix filter: k=2 pair-key blocking
    once the measured avg shingle df passes _PREFIX_DENSITY_SWITCH.
    Both orders are exact, so the switch must be invisible in results —
    these tests build a corpus DENSE ENOUGH to engage k=2 and compare
    the full query output against naive all-pairs brute force."""

    VOCAB = ["aa", "bb", "cc", "dd", "ee"]  # 5^3 = 125 shingle space

    def _mk_corpus(self, tmp_path, n_docs=240, seed=7):
        import random

        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = random.Random(seed)
        texts = []
        for i in range(n_docs):
            if i > 0 and rng.random() < 0.15:
                # planted near-dup: driver-law append of one word
                texts.append(texts[rng.randrange(i)] + " " +
                             rng.choice(self.VOCAB))
            else:
                texts.append(" ".join(
                    rng.choice(self.VOCAB)
                    for _ in range(rng.randint(8, 28))
                ))
        sf_dir = str(tmp_path / "dense")
        os.makedirs(sf_dir, exist_ok=True)
        pq.write_table(
            pa.table({
                "doc_id": list(range(n_docs)),
                "text": texts,
                "lang": ["en"] * n_docs,
                "source": [f"src{i % 3}" for i in range(n_docs)],
                "n_chars": [len(t) for t in texts],
            }),
            os.path.join(sf_dir, "documents.parquet"),
        )
        return sf_dir, texts

    @staticmethod
    def _brute_pairs(texts, t=0.6):
        def sh(s):
            w = s.split()
            return set(zip(w, w[1:], w[2:]))
        S = [sh(x) for x in texts]
        out = set()
        for a in range(len(S)):
            for b in range(a + 1, len(S)):
                if not S[a] or not S[b]:
                    continue
                j = len(S[a] & S[b]) / len(S[a] | S[b])
                if j >= t:
                    out.add((a, b))
        return out

    def test_dense_corpus_engages_k2_and_stays_exact(self, spark, tmp_path):
        from oke_cassandra_spark_locality_demo_spark.llm import dedup

        sf_dir, texts = self._mk_corpus(tmp_path)
        # the corpus really is past the switch (else the test is vacuous)
        sh = dedup._shingles(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet")), 3
        )
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        assert dedup._prefix_k(dfreq) == 2

        expected = self._brute_pairs(texts)
        assert len(expected) >= 10, "corpus must contain planted near-dups"
        for key in ("q_dedup_ngram_jaccard", "q_dedup_ngram_prefix"):
            got = {
                (r.doc_a, r.doc_b)
                for r in get(key).fn(spark, sf_dir).collect()
            }
            assert got == expected, (
                f"{key} under k=2 diverged from brute force: "
                f"missing={sorted(expected - got)[:5]} "
                f"extra={sorted(got - expected)[:5]}"
            )

    def test_sparse_corpus_keeps_k1(self, spark, sf_dir):
        """The driver fixtures sit well under the switch (measured avg
        df ~1.5 at sf0.01, ~8.7 at sf0.1): the classic path must keep
        serving them unchanged."""
        from oke_cassandra_spark_locality_demo_spark.llm import dedup

        d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        dfreq = (
            dedup._shingles(d, 3)
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        assert dedup._prefix_k(dfreq) == 1

    def test_degenerate_singleton_docs_still_pair(self, spark, tmp_path):
        """k=2's pigeonhole needs overlap >= 2; docs whose bound
        ceil(t*n) < 2 fall back to degenerate (s, s) keys. Two
        identical 3-word docs (a single shingle each, jaccard 1.0)
        must still be found on a corpus dense enough for k=2."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        sf_dir, texts = self._mk_corpus(tmp_path, n_docs=200)
        n = len(texts)
        texts = texts + ["aa bb cc", "aa bb cc"]
        pq.write_table(
            pa.table({
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["src0"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }),
            os.path.join(sf_dir, "documents.parquet"),
        )
        got = {
            (r.doc_a, r.doc_b)
            for r in get("q_dedup_ngram_prefix").fn(spark, sf_dir).collect()
        }
        assert (n, n + 1) in got, "degenerate singleton pair missed"
        assert got == self._brute_pairs(texts)

    @staticmethod
    def _brute_containment(texts, t=0.9):
        """Naive all-pairs directed containment(A ⊇ B) =
        |S_A ∩ S_B| / |S_B| over distinct 3-word shingles — the
        independent oracle for the k=2 asymmetric prefix-filter branch
        (llm/dedup.py q_dedup_containment else-arm). Same int/int
        double division as the query, so values compare exactly."""

        def sh(s):
            w = s.strip().lower().split()
            return set(zip(w, w[1:], w[2:]))

        S = [sh(x) for x in texts]
        out = {}
        for a in range(len(S)):
            for b in range(len(S)):
                if a == b or not S[a] or not S[b]:
                    continue
                c = len(S[a] & S[b]) / len(S[b])
                if c >= t:
                    out[(a, b)] = c
        return out

    def _mk_containment_corpus(self, tmp_path):
        """Dense corpus + planted containment cases, shared by the
        in-process parity test and the starved-subprocess rerun.
        Returns (sf_dir, texts, n) with texts[n:] the four planted
        docs (degenerate pair, then boundary n_sh=2 pair)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        sf_dir, texts = self._mk_corpus(tmp_path)
        n = len(texts)
        texts = texts + [
            # degenerate contained doc: one shingle, bound ⌈0.9·1⌉=1<2
            # → (s,s) keys; its container quotes it verbatim
            "aa bb cc",
            "dd ee aa bb cc dd ee aa",
            # boundary contained doc: n_sh=2 → bound ⌈1.8⌉=2, prefix
            # slice length n_cap−2+2 = n_cap → exactly one pair key
            "aa bb cc dd",
            "ee ee aa bb cc dd ee",
        ]
        pq.write_table(
            pa.table({
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": [f"src{i % 3}" for i in range(len(texts))],
                "n_chars": [len(t) for t in texts],
            }),
            os.path.join(sf_dir, "documents.parquet"),
        )
        return sf_dir, texts, n

    def test_dense_corpus_containment_k2_exact(self, spark, tmp_path):
        """VERDICT r12 item 1: the containment k=2 branch (asymmetric
        pair keys — contained side emits ordered pairs from its rarest
        subset of length n_cap − ⌈0.9·n_sh⌉ + 2, container side all
        within-set pairs + degenerate singles) landed in the r12
        closing commit with no saturated-corpus test. This is that
        test: a corpus dense enough to engage _prefix_k == 2, with
        planted quotation/subset/degenerate cases, compared pair-for-
        pair AND value-for-value against naive all-pairs brute force."""
        from oke_cassandra_spark_locality_demo_spark.llm import dedup

        sf_dir, texts, n = self._mk_containment_corpus(tmp_path)

        # the corpus really is past the switch (else the test is
        # vacuous and the classic self-join path would be exercised
        # instead of the asymmetric generalized prefix filter)
        sh = dedup._shingles(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet")),
            dedup.CONTAINMENT_SHINGLE_K,
        )
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        assert dedup._prefix_k(dfreq) == 2

        expected = self._brute_containment(texts)
        assert len(expected) >= 10, "corpus must contain planted containments"
        # both planted directed pairs must be in the truth set
        assert expected[(n + 1, n)] == 1.0
        assert expected[(n + 3, n + 2)] == 1.0

        got = {
            (r.container, r.contained): r.containment
            for r in get("q_dedup_containment").fn(spark, sf_dir).collect()
        }
        assert set(got) == set(expected), (
            "containment k=2 diverged from brute force: "
            f"missing={sorted(set(expected) - set(got))[:5]} "
            f"extra={sorted(set(got) - set(expected))[:5]}"
        )
        for pair, val in expected.items():
            assert got[pair] == val, (pair, got[pair], val)

    def test_dense_containment_k2_survives_starvation(self, tmp_path):
        """Same dense corpus, same brute-force truth set, but executed
        under spark.memory.fraction=0.05 (static conf — needs its own
        JVM): the starved physical plan (_stage_barrier DISK_ONLY
        materialization + low-parallelism stages) must not change a
        single pair or value on the k=2 containment branch, matching
        the starvation discipline the jaccard family already carries
        (TestStarvationHardening)."""
        import json
        import subprocess
        import sys

        sf_dir, texts, _n = self._mk_containment_corpus(tmp_path)
        out_path = str(tmp_path / "starved_containment.json")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = (
            "import json, sys\n"
            f"sys.path.insert(0, {repo!r})\n"
            "from pyspark.sql import SparkSession\n"
            "spark = (SparkSession.builder.master('local[8]')\n"
            "    .config('spark.sql.shuffle.partitions', '8')\n"
            "    .config('spark.memory.fraction', '0.05')\n"
            "    .config('spark.ui.enabled', 'false')\n"
            "    .getOrCreate())\n"
            "spark.sparkContext.setLogLevel('ERROR')\n"
            "from oke_cassandra_spark_locality_demo_spark.llm import dedup\n"
            "assert dedup._exec_memory_starved(spark), 'starved regime not detected'\n"
            "from oke_cassandra_spark_locality_demo_spark.registry import get\n"
            f"rows = get('q_dedup_containment').fn(spark, {sf_dir!r}).collect()\n"
            f"json.dump([[r.container, r.contained, r.containment] for r in rows],\n"
            f"          open({out_path!r}, 'w'))\n"
            "spark.stop()\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, timeout=600,
            env={**os.environ, "PYTHONDONTWRITEBYTECODE": "1"},
        )
        assert proc.returncode == 0, (proc.stdout[-800:], proc.stderr[-1500:])
        got = {
            (a, b): v for a, b, v in json.load(open(out_path))
        }
        expected = self._brute_containment(texts)
        assert set(got) == set(expected)
        for pair, val in expected.items():
            assert got[pair] == val, (pair, got[pair], val)


def test_perplexity_bigram_pseudo_row_token_accounting(spark, tmp_path):
    """r14 rework pin: q_text_perplexity_bigram derives unigram counts
    and vocabulary from the bigram pass via a (last-token, NULL)
    pseudo-row instead of a separate token explode. Brute-force parity
    on a corpus planted with exactly the edge shapes that accounting
    must get right: an empty text (one '' token, no bigram), a
    single-word doc (token, no bigram), a doc whose last word also
    appears mid-doc, and repeated bigrams inside one doc."""
    import math
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from oke_cassandra_spark_locality_demo_spark.registry import get

    texts = [
        "the cat sat on the mat the cat sat",   # repeated bigrams; 'sat' last + mid-doc
        "hello",                                 # single word: token only
        "",                                      # empty: one '' token
        "the the the",                           # degenerate repetition
        "cat mat",                               # 2 words, 1 bigram
    ]
    n = len(texts)
    sf = str(tmp_path / "ppx")
    os.makedirs(sf, exist_ok=True)
    pq.write_table(
        pa.table({
            "doc_id": list(range(n)),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [len(t) for t in texts],
        }),
        os.path.join(sf, "documents.parquet"),
    )

    # brute force per the oracle definition (tokens = split on ' ')
    toks = {i: t.strip().lower().split(" ") for i, t in enumerate(texts)}
    lm1: dict[str, int] = {}
    lm2: dict[tuple, int] = {}
    for ws in toks.values():
        for w in ws:
            lm1[w] = lm1.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            lm2[(a, b)] = lm2.get((a, b), 0) + 1
    v = len(lm1)
    expected = {}
    for i, ws in toks.items():
        bgs = list(zip(ws, ws[1:]))
        if not bgs:
            continue
        s = sum(
            int(round(-(math.log((lm2[bg] + 1.0) / (lm1[bg[0]] + v))
                        / math.log(2.0)) * 1e6))
            for bg in bgs
        )
        expected[i] = (len(bgs), s / 1e6 / len(bgs))

    rows = get("q_text_perplexity_bigram").fn(spark, sf).collect()
    got = {r["doc_id"]: (r["n_bigrams"], r["cross_entropy2"]) for r in rows}
    assert set(got) == set(expected), (sorted(got), sorted(expected))
    for i in expected:
        assert got[i][0] == expected[i][0], (i, got[i], expected[i])
        assert got[i][1] == pytest.approx(expected[i][1], abs=1e-9), (
            i, got[i], expected[i],
        )


def test_lsh_rework_parity_vs_reference_formulation(spark, sf_dir):
    """r14 optimization parity pin (the simhash-parity pattern):
    q_sim_lsh is rows-only, so its Arrow-batch rework (NumPy
    dimension-sequential folds for buckets and cosines, pandas probe
    join, per-batch local top-k) is pinned in CI against the pre-r14
    all-JVM formulation — interpreted zip_with/aggregate folds, a
    broadcast bucket join, and the full pair stream through the window.
    Exact row-set equality including the rounded cosine doubles."""
    from pyspark.sql import Window as W

    from oke_cassandra_spark_locality_demo_spark.llm.similarity import (
        N_PLANES,
        TOP_K,
        _bucket_of,
        _dot,
        _queries_and_candidates,
    )

    q, c = _queries_and_candidates(spark, sf_dir)
    probe_offsets = F.array(F.lit(0), *[F.lit(1 << i) for i in range(N_PLANES)])
    qb = (
        q.withColumn("home_bucket", _bucket_of(F.col("qv")))
        .withColumn("probe", F.explode(probe_offsets))
        .withColumn("bucket", F.col("home_bucket").bitwiseXOR(F.col("probe")))
        .drop("home_bucket", "probe")
    )
    cb = c.withColumn("bucket", _bucket_of(F.col("cv")))
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm"))
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    ref = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "cand_id", F.round("cosine", 6).alias("cosine"))
    )
    ref_rows = sorted(tuple(r) for r in ref.collect())
    got_rows = sorted(
        tuple(r) for r in get("q_sim_lsh").fn(spark, sf_dir).collect()
    )
    assert got_rows, "LSH returned nothing"
    assert got_rows == ref_rows, (
        f"missing={sorted(set(ref_rows) - set(got_rows))[:5]} "
        f"extra={sorted(set(got_rows) - set(ref_rows))[:5]}"
    )


def test_simhash_fold_kernel_batch_boundaries():
    """r14 kernel pin: _simhash_fold_batches merges a doc split across
    Arrow batch boundaries into one exact fingerprint (same result as
    the unsplit stream), and raises on a NON-contiguous doc run instead
    of silently emitting duplicate fingerprints. Pure-Python brute
    force: per doc, bit i of the fingerprint is set iff
    2*count(set bit i over word hashes) > n_words."""
    import numpy as np
    import pandas as pd

    from oke_cassandra_spark_locality_demo_spark.llm.dedup import (
        _simhash_fold_batches,
    )

    rng = np.random.RandomState(7)
    doc = np.repeat(np.array([10, 11, 12], dtype=np.int64), [5, 9, 2])
    h = rng.randint(-(2**63), 2**63 - 1, size=len(doc)).astype(np.int64)

    def brute(doc, h):
        out = {}
        for d in np.unique(doc):
            hs = h[doc == d]
            v = 0
            for i in range(64):
                c = int(((hs >> i) & 1).sum())
                if 2 * c > len(hs):
                    v |= 1 << i
            out[int(d)] = v - (1 << 64) if v >= (1 << 63) else v
        return out

    expected = brute(doc, h)

    def run(splits):
        batches = [
            pd.DataFrame({"doc_id": doc[a:b], "h": h[a:b]})
            for a, b in zip([0] + splits, splits + [len(doc)])
        ]
        got = pd.concat(list(_simhash_fold_batches(iter(batches))))
        return dict(zip(got["doc_id"].astype(int), got["simhash"].astype(int)))

    # unsplit, split inside doc 11, split at a doc edge, every-3-rows
    assert run([]) == expected
    assert run([8]) == expected
    assert run([5]) == expected
    assert run([3, 6, 9, 12]) == expected

    # non-contiguous doc run (10 reappears after 11) must raise
    bad = pd.DataFrame({"doc_id": np.array([10, 10, 11, 10], dtype=np.int64),
                        "h": h[:4]})
    with pytest.raises(RuntimeError, match="non-contiguous"):
        list(_simhash_fold_batches(iter([bad])))
    # ... also when the repeat crosses a batch boundary
    b1 = pd.DataFrame({"doc_id": np.array([10, 11], dtype=np.int64), "h": h[:2]})
    b2 = pd.DataFrame({"doc_id": np.array([10], dtype=np.int64), "h": h[2:3]})
    with pytest.raises(RuntimeError, match="non-contiguous"):
        list(_simhash_fold_batches(iter([b1, b2])))
