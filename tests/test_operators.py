

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
