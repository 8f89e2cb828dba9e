"""Keyed tables are hash-bucket partitioned; key lookups must prune
partitions (the engine's replacement for the reference's per-column
B+tree point access — SURVEY.md §1.1 Index row)."""

import contextlib
import io
import re

from reactivedb_spark import Engine

CFG = {
    "tables": [
        {"Source": {"name": "users", "columns": {"name": "Str", "age": "Integer"}}},
        {"Derived": {"name": "u",
                     "transform_definition": {"UnionTransform": {
                         "tables_and_foreign_keys": [["users", "name"]]}}}},
    ]
}


def test_keyed_lookup_prunes_partitions(spark, workspace):
    eng = Engine(spark, CFG, workspace=workspace)
    eng.insert("users", [{"name": f"user{i}", "age": i} for i in range(50)])

    scan = eng._keyed_scan("u", "matchingKey", "user7")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", buf.getvalue())
    assert m and "_kb" in m.group(1), f"no partition filter: {m}"

    # correctness unchanged; internal columns stay hidden
    row = eng.find_one("u", "matchingKey", "user7")
    assert row["age"] == 7 and "_kb" not in row and "_seq" not in row
    assert "_kb" not in eng.table("u").columns

    # non-key equality still works (full scan, no pruning — like the
    # reference erroring only on UNindexed columns, we just scan)
    assert eng.find_one("u", "age", 9)["matchingKey"] == "user9"


INT_CFG = {
    "tables": [
        {"Source": {"name": "readings", "columns": {"sensor": "Integer", "v": "Integer"}}},
        {"Derived": {"name": "latest",
                     "transform_definition": {"UnionTransform": {
                         "tables_and_foreign_keys": [["readings", "sensor"]]}}}},
        {"Derived": {"name": "totals",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "readings",
                         "aggregated_column": "sensor",
                         "functions": ["n ~ memo.n + 1", "sum ~ memo.sum + v"]}}}},
    ]
}


def test_integer_key_lookup_finds_rows(spark, workspace):
    """hash() is type-sensitive (int vs bigint literals hash differently);
    the bucket probe must cast the literal to the stored column type or
    integer-keyed lookups prune to the wrong partition and return nothing."""
    eng = Engine(spark, INT_CFG, workspace=workspace)
    eng.insert("readings", [{"sensor": i % 10, "v": i} for i in range(40)])

    for key in (0, 3, 7, 9):
        row = eng.find_one("latest", "matchingKey", key)
        assert row is not None and row["matchingKey"] == key, key
        agg = eng.find_one("totals", "aggregatedColumn", key)
        assert agg is not None and agg["n"] == 4, key
    assert eng.get_all("latest", "matchingKey", 5).count() == 1
    assert eng.find_one("latest", "matchingKey", 123) is None


def test_single_key_commit_rewrites_only_affected_buckets(spark, workspace):
    """A 1-key commit must physically rewrite only the bucket dirs holding
    that key; every other bucket's files are carried forward as hardlinks
    (st_nlink > 1), not rewritten — the per-key upsert economics of the
    reference's B+tree at Spark scale."""
    import os

    eng = Engine(spark, CFG, workspace=workspace)
    eng.insert("users", [{"name": f"user{i}", "age": i} for i in range(200)])

    store = eng.store
    v_before = store._versions["u"]
    eng.insert("users", [{"name": "user7", "age": 99}])
    v_after = store._versions["u"]
    assert v_after > v_before

    new_dir = store._dir("u", v_after)
    fresh_buckets = set()
    total_buckets = set()
    for d in os.listdir(new_dir):
        if not d.startswith("_kb="):
            continue
        total_buckets.add(d)
        for f in os.listdir(os.path.join(new_dir, d)):
            if f.endswith(".parquet") and os.stat(
                os.path.join(new_dir, d, f)
            ).st_nlink == 1:
                fresh_buckets.add(d)
    assert len(total_buckets) > 10, "fixture too small to be meaningful"
    assert len(fresh_buckets) <= 2, f"rewrote {sorted(fresh_buckets)}"

    # and the merged value is visible
    assert eng.find_one("u", "matchingKey", "user7")["age"] == 99


KEYED_ORDERS_CFG = {
    "tables": [
        {"Source": {"name": "orders", "columns": {
            "o_orderkey": "Integer", "o_totalprice": "Float"}}},
        {"Derived": {"name": "latest",
                     "transform_definition": {"UnionTransform": {
                         "tables_and_foreign_keys": [["orders", "o_orderkey"]]}}}},
    ]
}


def test_range_verbs_push_filters_and_rowgroup_stats_skip(spark, workspace):
    """VERDICT r4 #6: at a larger fixture the verbs must not degenerate
    to stat-blind full scans. Point lookups prune hash buckets (asserted
    above); range verbs get (a) the predicate pushed into the parquet
    scan and (b) sortWithinPartitions(key) row-group min/max stats that
    make most row groups skippable for a selective range — the reader
    prunes them from the pushed filter. Row groups are forced small so
    each bucket file holds several."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    old_page = hconf.get("parquet.page.size")
    hconf.set("parquet.block.size", "4096")
    hconf.set("parquet.page.size", "1024")
    try:
        eng = Engine(spark, KEYED_ORDERS_CFG, workspace=workspace)
        orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
            F.col("o_orderkey").cast("long"),
            F.col("o_totalprice"),
        )
        eng.insert_df("orders", orders)
    finally:
        (hconf.set if old_block else hconf.unset)(*(k for k in ["parquet.block.size", old_block] if k is not None))
        (hconf.set if old_page else hconf.unset)(*(k for k in ["parquet.page.size", old_page] if k is not None))

    probe = 3000  # ~10th percentile of 1..30000 orderkeys

    def pushed(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        m = re.search(r"PushedFilters: \[([^\]]*)\]", buf.getvalue())
        return m.group(1) if m else ""

    lt = eng.less_than("latest", "matchingKey", probe)
    gt = eng.greater_than("latest", "matchingKey", probe)
    assert "LessThan(matchingKey" in pushed(lt), pushed(lt)
    assert "GreaterThanOrEqual(matchingKey" in pushed(gt), pushed(gt)

    # footer-stat skippability: per-bucket sorted state → disjoint
    # row-group key ranges → a selective `<` probe overlaps few groups
    files = glob.glob(os.path.join(eng.store._dir("latest"), "_kb=*", "*.parquet"))
    assert files
    total = overlapping = 0
    for f in files:
        md = pq.read_metadata(f)
        idx = {md.schema.column(i).name: i for i in range(len(md.schema.names))}["matchingKey"]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st.min < probe:  # reader must read it for `< probe`
                overlapping += 1
    assert total >= 3 * len(files), f"row groups not split ({total} in {len(files)} files)"
    assert overlapping / total <= 0.35, (overlapping, total)

    # correctness at the verbs themselves (TPC-H orderkeys are sparse)
    want_lt = orders.filter(F.col("o_orderkey") < probe).count()
    assert lt.count() == want_lt > 0
    assert gt.count() == orders.count() - want_lt
