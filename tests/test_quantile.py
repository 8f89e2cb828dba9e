"""Histogram quantile sketch: accuracy bound, mergeability, edge groups."""
from pyspark.sql import functions as F

from reactivedb_spark.operators import quantile


def test_estimate_within_one_bin_width(spark):
    """|est - exact percentile| <= one bin width, per group and q."""
    rows = [(g, float(v * (g + 1) + (v % 7))) for g in range(3)
            for v in range(2000)]
    df = spark.createDataFrame(rows, "g int, v double")
    qs = [0.5, 0.9, 0.99]
    got = {(r["g"], r["q"]): r["est"]
           for r in quantile.approx_quantiles(df, ["g"], "v", qs).collect()}
    assert len(got) == 9
    import statistics
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        w = (vals[-1] - vals[0]) / quantile.HIST_BINS
        for q in qs:
            exact = statistics.quantiles(vals, n=10**4)[int(q * 10**4) - 1]
            assert abs(got[(g, q)] - exact) <= w + 1e-9, (g, q)


def test_histogram_merges_by_cnt_sum(spark):
    """Sketch of a union == (group,bin)-summed union of sketches, PROVIDED
    the sub-corpora share the group ranges (the documented merge rule)."""
    # identical min/max in both halves so the grids align
    left = spark.createDataFrame(
        [(0, 0.0), (0, 1000.0)] + [(0, float(i % 997)) for i in range(3000)],
        "g int, v double")
    right = spark.createDataFrame(
        [(0, 0.0), (0, 1000.0)] + [(0, float((i * 13) % 1001)) for i in range(2000)],
        "g int, v double")
    from pyspark.sql.window import Window

    direct = quantile.histogram_sketch(left.unionAll(right), ["g"], "v")
    merged = (
        quantile.histogram_sketch(left, ["g"], "v")
        .unionByName(quantile.histogram_sketch(right, ["g"], "v"))
        .groupBy("g", "bin", "vmin", "w")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        # n is derivable: always the group's cnt total
        .withColumn("n", F.sum("cnt").over(Window.partitionBy("g")).cast("long"))
        .select("g", "bin", "vmin", "w", "n", "cnt")
    )
    assert sorted(map(tuple, direct.collect())) \
        == sorted(map(tuple, merged.collect()))


def test_degenerate_and_null_groups(spark):
    """A single-valued group estimates that value for every q; NULLs are
    excluded before both passes (an all-NULL group vanishes)."""
    df = spark.createDataFrame(
        [("a", 42.0)] * 5 + [("a", None)] + [("b", None)],
        "g string, v double")
    out = quantile.approx_quantiles(df, ["g"], "v", [0.5, 0.99]).collect()
    assert {(r["g"], r["q"], r["est"]) for r in out} \
        == {("a", 0.5, 42.0), ("a", 0.99, 42.0)}
