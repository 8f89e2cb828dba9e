"""Parity queries: the reference's operator inventory (SURVEY.md §2)
exercised over the TPC-H-ish fixtures, each with a DuckDB oracle.

Determinism across engines (what makes the value hashes match):
- per-row double arithmetic uses the same operation order on both sides
  (IEEE doubles → bit-identical);
- every aggregate over fractional values sums **decimals** (exact,
  order-independent) — never raw doubles;
- timestamps are NTZ → DATE casts are timezone-independent; nothing
  finer than DATE is emitted;
- uuid system columns never appear in compared output.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from reactivedb_spark.config import AggregationTransformConfig, UnionTransformConfig
from reactivedb_spark.engine import Engine
from reactivedb_spark.expr import compile_expr, parse_statement
from reactivedb_spark.operators import action as action_op
from reactivedb_spark.operators import aggregation as agg_op
from reactivedb_spark.operators import union as union_op
from reactivedb_spark.suite._common import load
from reactivedb_spark import constants as C


def _dsl_select(df: DataFrame, keys: list[str], statements: list[str]) -> DataFrame:
    """FunctionTransform core: compile DSL assignments against the input
    schema (transform.rs:128-148 semantics, minus system columns)."""
    cols = [F.col(k) for k in keys]
    for s in statements:
        st = parse_statement(s)
        cols.append(compile_expr(st.expr, df.schema).col.alias(st.dest))
    return df.select(*cols)


# -- FunctionTransform --------------------------------------------------------

def q_function_transform(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return _dsl_select(
        li,
        ["l_orderkey", "l_linenumber"],
        [
            "gross ~ l_extendedprice * (1 + l_tax)",
            "disc_price ~ l_extendedprice * (1 - l_discount)",
            "qty_bucket ~ l_quantity / 10",
            "half_line ~ l_linenumber / 2",
        ],
    )


SQL_FUNCTION_TRANSFORM = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 + l_tax) AS gross,
       l_extendedprice * (1 - l_discount) AS disc_price,
       l_quantity / 10 AS qty_bucket,
       CAST(l_linenumber // 2 AS BIGINT) AS half_line
FROM lineitem
"""


# -- FilterTransform ----------------------------------------------------------

def q_filter_transform(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    st = parse_statement('(o_totalprice > 150000.0) && (o_orderstatus == "O")')
    pred = compile_expr(st.expr, o.schema).col
    return o.filter(pred).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


SQL_FILTER_TRANSFORM = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
"""


# -- UnionTransform -----------------------------------------------------------

def q_union_transform(spark: SparkSession, sf: str) -> DataFrame:
    """customer ∪ orders merged by custkey with per-column last-writer-wins;
    sequencing makes "last" = highest orderkey, so the oracle is a full
    outer join against each customer's latest order."""
    from pyspark.sql import types as T

    cust = load(spark, sf, "customer").select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias(C.ENTRY_ID),
        F.lit(0).cast("long").alias(C.SEQ),
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    )
    orders = load(spark, sf, "orders").select(
        F.concat(F.lit("o"), F.col("o_orderkey")).alias(C.ENTRY_ID),
        (F.col("o_orderkey") + 1).cast("long").alias(C.SEQ),
        "o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority",
    )
    cfg = UnionTransformConfig((("customer", "c_custkey"), ("orders", "o_custkey")))
    out_schema = union_op.output_schema(
        cfg, {"customer": cust.schema, "orders": orders.schema}
    )
    nc = union_op.normalize_delta(cfg, "customer", cust, out_schema)
    no = union_op.normalize_delta(cfg, "orders", orders, out_schema)
    merged = union_op.merge(nc, no, out_schema)
    return merged.select(
        F.col(C.MATCHING_KEY).alias("matchingKey"),
        "c_name", "c_acctbal", "c_mktsegment",
        "o_orderkey", "o_totalprice", "o_orderstatus",
    )


SQL_UNION_TRANSFORM = """
WITH latest AS (
  SELECT * FROM orders
  QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) = 1
)
SELECT COALESCE(c.c_custkey, l.o_custkey) AS "matchingKey",
       c.c_name, c.c_acctbal, c.c_mktsegment,
       l.o_orderkey, l.o_totalprice, l.o_orderstatus
FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.o_custkey
"""


# -- AggregationTransform -----------------------------------------------------

def q_aggregation_transform(spark: SparkSession, sf: str) -> DataFrame:
    """memo-fold aggregation over lineitem by orderkey, compiled through
    the engine's decomposable-aggregate path (sum/count map to native
    partial aggregates)."""
    li = load(spark, sf, "lineitem").select(
        F.concat(F.lit("l"), F.col("l_orderkey"), F.lit("_"), F.col("l_linenumber")).alias(C.ENTRY_ID),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias(C.SEQ),
        "l_orderkey",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty_dec"),
    )
    cfg = AggregationTransformConfig(
        "lineitem",
        "l_orderkey",
        tuple(parse_statement(s) for s in
              ["n_rows ~ memo.n_rows + 1", "sum_qty ~ memo.sum_qty + qty_dec"]),
    )
    out = agg_op.compute_groups(cfg, li)
    return out.select(
        F.col(C.AGGREGATED_COLUMN).alias("l_orderkey"),
        "n_rows",
        # final decimal→double cast is deterministic cross-engine (verified
        # bit-identical vs DuckDB); keeps the driver's hasher off decimals.
        F.col("sum_qty").cast("double").alias("sum_qty"),
        (F.col("sum_qty").cast("double") / F.col("n_rows")).alias("avg_qty"),
    )


SQL_AGGREGATION_TRANSFORM = """
SELECT l_orderkey,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
         / CAST(count(*) AS BIGINT) AS avg_qty
FROM lineitem GROUP BY l_orderkey
"""


# -- query verbs --------------------------------------------------------------

def q_find_one(spark: SparkSession, sf: str) -> DataFrame:
    # unique key → limit(1) is deterministic (Appendix A #10 caveat avoided)
    return (
        load(spark, sf, "orders")
        .filter(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(1)
    )


SQL_FIND_ONE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey = 42
"""


def q_get_all(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") == 42)
        .select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_returnflag", "l_linestatus",
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
    )


SQL_GET_ALL = """
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
       l_extendedprice, l_returnflag, l_linestatus,
       CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem WHERE l_orderkey = 42
"""


def q_less_than(spark: SparkSession, sf: str) -> DataFrame:
    # strict < (database.rs:70)
    return (
        load(spark, sf, "orders")
        .filter(F.col("o_totalprice") < 50000.0)
        .select("o_orderkey", "o_totalprice")
    )


SQL_LESS_THAN = "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 50000.0"


def q_greater_than(spark: SparkSession, sf: str) -> DataFrame:
    # inclusive >= (btree.rs:200-223)
    return (
        load(spark, sf, "orders")
        .filter(F.col("o_totalprice") >= 400000.0)
        .select("o_orderkey", "o_totalprice")
    )


SQL_GREATER_THAN = "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 400000.0"


# -- delete cascade (full engine end-to-end) ----------------------------------

CUSTOMER_ENGINE_CFG = {
    "tables": [
        {"Source": {"name": "customer", "columns": {
            "c_custkey": "Integer", "c_name": "Str", "c_nationkey": "Integer",
            "c_acctbal": "Float", "c_mktsegment": "Str"}}},
        {"Derived": {"name": "positive_bal",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "customer",
                         "filter": "c_acctbal > 0.0"}}}},
    ]
}


def q_delete_cascade(spark: SparkSession, sf: str) -> DataFrame:
    """Full engine: bulk-insert customers, delete nation 5, read the
    derived filter table — cascade by provenance (transform_hook.rs:56-64)."""
    eng = Engine(spark, CUSTOMER_ENGINE_CFG,
                 workspace=tempfile.mkdtemp(prefix="rdb_cascade_"))
    cust = load(spark, sf, "customer").select(
        F.col("c_custkey").cast("long"),
        "c_name",
        F.col("c_nationkey").cast("long"),
        "c_acctbal",
        "c_mktsegment",
    )
    eng.insert_df("customer", cust)
    eng.delete("customer", "c_nationkey", 5)
    return eng.table("positive_bal").select("c_custkey", "c_name", "c_acctbal")


SQL_DELETE_CASCADE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer WHERE c_acctbal > 0.0 AND c_nationkey <> 5
"""


# -- ActionTransform (Arrow-batched Python UDF path) --------------------------

def q_action_transform(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        F.col("event_id").cast("string").alias(C.ENTRY_ID),
        F.col("event_id").alias(C.SEQ),
        "event_id", "user_id", "value",
    )

    def penalize(pdf):
        out = pdf.copy()
        out["value"] = out["value"] - 10.0
        return out

    act = action_op.Action("penalize", penalize)
    from reactivedb_spark.config import ActionTransformConfig

    cfg = ActionTransformConfig("penalize", "events")
    out_schema = action_op.output_schema(cfg, act, ev.schema)
    out = action_op.apply_delta(cfg, act, ev, out_schema)
    return out.select("event_id", "user_id", F.col("value").alias("value_adj"))


SQL_ACTION_TRANSFORM = """
SELECT event_id, user_id, "value" - 10.0 AS value_adj FROM events
"""


# -- expression DSL surface ---------------------------------------------------

def q_expr_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    return _dsl_select(
        p,
        ["p_partkey"],
        [
            "half_size ~ p_size / 2",
            'label ~ p_brand + "#" + p_type',
            "pw ~ p_size ^ 2",
            "is_big ~ (p_size >= 25) && (p_retailprice > 1500.0)",
        ],
    )


SQL_EXPR_ARITHMETIC = """
SELECT p_partkey,
       CAST(p_size // 2 AS BIGINT) AS half_size,
       p_brand || '#' || p_type AS label,
       power(p_size, 2) AS pw,
       (p_size >= 25) AND (p_retailprice > 1500.0) AS is_big
FROM part
"""


def q_expr_functions(spark: SparkSession, sf: str) -> DataFrame:
    """The DSL scalar-function library (declared extension — the
    reference PARSES ``word(args)`` but errors at execution,
    transform.rs:291 'currently unimplimented'; PythonMVP prototyped ABS,
    transforms.py:25,188): abs/floor/ceil/sqrt/length/upper/lower/
    concat/coalesce compiled to native Column expressions, plus the
    declared div-by-zero → NULL contract (SURVEY.md Appendix A #6)
    threaded through coalesce. All outputs are long/string/IEEE-double
    (sqrt is correctly rounded per IEEE in both engines), so the hash
    compare is exact."""
    p = load(spark, sf, "part")
    return _dsl_select(
        p,
        ["p_partkey"],
        [
            "a ~ abs(p_size - 30)",
            "fl ~ floor(p_retailprice)",
            "ce ~ ceil(p_retailprice)",
            "sq ~ sqrt(p_size)",
            "ln ~ length(p_type)",
            "up ~ upper(p_type)",
            "lo ~ lower(p_brand)",
            'cc ~ concat(p_brand, "#", p_name)',
            "co ~ coalesce(p_size / 0, 0 - 1)",
        ],
    )


SQL_EXPR_FUNCTIONS = """
SELECT p_partkey,
       CAST(abs(p_size - 30) AS BIGINT) AS a,
       CAST(floor(p_retailprice) AS BIGINT) AS fl,
       CAST(ceil(p_retailprice) AS BIGINT) AS ce,
       sqrt(CAST(p_size AS DOUBLE)) AS sq,
       CAST(length(p_type) AS BIGINT) AS ln,
       upper(p_type) AS up,
       lower(p_brand) AS lo,
       p_brand || '#' || p_name AS cc,
       -- DuckDB's // 0 is NULL, same as the engine's declared contract
       CAST(coalesce(p_size // 0, -1) AS BIGINT) AS co
FROM part
"""


def q_array_filter_dsl(spark: SparkSession, sf: str) -> DataFrame:
    """Array columns end-to-end through the DSL: per-order quantity arrays
    (ordered by linenumber) compared LEXICOGRAPHICALLY by the compiled
    filter expression — the reference's Vec::cmp Array semantics
    (config/types.rs:26), which Spark's native array ordering matches
    (prefix-shorter-first included)."""
    li = load(spark, sf, "lineitem")
    by_line = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("l_linenumber").alias("ln"), F.col("l_quantity").alias("q"))
            )
        ),
        lambda s: s["q"],
    )
    per = (
        li.groupBy("l_orderkey")
        .agg(by_line.alias("qty_by_line"))
        .withColumn("qty_rev", F.reverse(F.col("qty_by_line")))
    )
    st = parse_statement("qty_by_line < qty_rev")
    pred = compile_expr(st.expr, per.schema).col
    # the array COMPARISON under test happens in the filter; the output
    # arrays are flattened to canonical comma-joined strings because the
    # driver's pandas canonicalizer cannot hash list columns (both engines
    # print doubles identically for these x.0 quantities)
    as_str = lambda c: F.array_join(  # noqa: E731
        F.transform(c, lambda x: x.cast("string")), ","
    )
    return per.filter(pred).select(
        "l_orderkey",
        as_str("qty_by_line").alias("qty_by_line"),
        as_str("qty_rev").alias("qty_rev"),
        F.size("qty_by_line").cast("long").alias("n_items"),
    )


SQL_ARRAY_FILTER_DSL = """
WITH per AS (
  SELECT l_orderkey,
         -- (linenumber, quantity) tie-break: linenumbers repeat in this
         -- fixture, and an unpinned tie order is engine-nondeterministic
         list(l_quantity ORDER BY l_linenumber, l_quantity) AS qty_by_line,
         list(l_quantity ORDER BY l_linenumber DESC, l_quantity DESC) AS qty_rev
  FROM lineitem GROUP BY l_orderkey)
SELECT l_orderkey,
       array_to_string(qty_by_line, ',') AS qty_by_line,
       array_to_string(qty_rev, ',') AS qty_rev,
       CAST(len(qty_by_line) AS BIGINT) AS n_items
FROM per WHERE qty_by_line < qty_rev
"""


# -- Map(struct) columns end-to-end -------------------------------------------

PART_SPEC_ENGINE_CFG = {
    "tables": [
        {"Source": {"name": "part_specs", "columns": {
            "p_partkey": "Integer",
            # the reference's Map row type (reactive_db/src/types.rs:24-33):
            # an ordered (name, type) struct column
            "spec": {"Map": {"size": "Integer", "brand": "Str", "retail": "Float"}}}}},
        {"Derived": {"name": "big_specs",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "part_specs",
                         "filter": "spec.size >= 25"}}}},
        {"Derived": {"name": "spec_calc",
                     "transform_definition": {"FunctionTransform": {
                         "source_table": "big_specs",
                         "functions": ["pk ~ p_partkey",
                                       "dsize ~ spec.size * 2",
                                       "label ~ spec.brand + \"#\" + spec.brand",
                                       "retail ~ spec.retail"]}}}},
    ]
}


def q_struct_map_project(spark: SparkSession, sf: str) -> DataFrame:
    """Map(struct) column through the full engine: config parse (Map type),
    bulk insert of a struct column, a FilterTransform predicate on a
    struct FIELD, and FunctionTransform projections reading fields out of
    the struct (reference Map semantics, types.rs:24-33). Output is
    scalar fields only — the driver canonicalizer cannot hash struct
    payloads (same contract as array_filter_dsl)."""
    eng = Engine(spark, PART_SPEC_ENGINE_CFG,
                 workspace=tempfile.mkdtemp(prefix="rdb_struct_"))
    part = load(spark, sf, "part").select(
        F.col("p_partkey").cast("long"),
        F.struct(
            F.col("p_size").cast("long").alias("size"),
            F.col("p_brand").alias("brand"),
            F.col("p_retailprice").alias("retail"),
        ).alias("spec"),
    )
    eng.insert_df("part_specs", part)
    return eng.table("spec_calc").select("pk", "dsize", "label", "retail")


SQL_STRUCT_MAP_PROJECT = """
SELECT p_partkey AS pk,
       CAST(p_size * 2 AS BIGINT) AS dsize,
       p_brand || '#' || p_brand AS label,
       p_retailprice AS retail
FROM part WHERE p_size >= 25
"""


LISTEN_ENGINE_CFG = {
    "tables": [
        {"Source": {"name": "customer", "columns": {
            "c_custkey": "Integer", "c_name": "Str", "c_nationkey": "Integer",
            "c_acctbal": "Float", "c_mktsegment": "Str"}}},
        {"Derived": {"name": "pos_bal",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "customer",
                         "filter": "c_acctbal > 0.0"}}}},
        {"Derived": {"name": "big_bal",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "pos_bal",
                         "filter": "c_acctbal > 5000.0"}}}},
    ]
}


def q_listen_cascade_events(spark: SparkSession, sf: str) -> DataFrame:
    """Listen-path event delivery through a MULTI-LEVEL cascade
    (VERDICT r8 #7): the reference fires one listener event per table
    per cascade level (listener_hook.rs:56-84); here a 3-level chain
    customer → pos_bal → big_bal carries one bulk insert and one
    cascading delete, with Insert AND Delete subscribers on every
    level. The result is the delivered-event census — (tbl, event,
    n_events, n_rows) — which the oracle replays from the raw fixture:
    each commit must produce EXACTLY ONE event per touched table per
    direction, whose row set equals the level's predicate algebra
    (delete rows at level k = source predicate ∧ cascade key). Row sets
    are counted from the delivered snapshots, so an extra event, a
    missed level, or a leaked/short delta breaks the match."""
    import shutil

    workspace = tempfile.mkdtemp(prefix="rdb_listen_")
    counts: dict = {}
    # The tallies .count() every delivered snapshot DURING the commits,
    # and the result is built from the collected counts — nothing lazy
    # references the workspace afterwards, so it can be retired in the
    # finally (ADVICE r9: mkdtemp workspaces must not leak per run).
    try:
        eng = Engine(spark, LISTEN_ENGINE_CFG, workspace=workspace)

        def tally(tbl, event):
            def cb(df):
                calls, rows = counts.get((tbl, event), (0, 0))
                counts[(tbl, event)] = (calls + 1, rows + df.count())
            return cb

        tables = ("customer", "pos_bal", "big_bal")
        for t in tables:
            eng.listen(t, "Insert", tally(t, "Insert"))
            eng.listen(t, "Delete", tally(t, "Delete"))
        cust = load(spark, sf, "customer").select(
            F.col("c_custkey").cast("long"), "c_name",
            F.col("c_nationkey").cast("long"), "c_acctbal", "c_mktsegment")
        eng.insert_df("customer", cust)          # commit 1: Insert every level
        eng.delete("customer", "c_nationkey", 5)  # commit 2: Delete all levels
        eng.flush_listeners()  # reap the staged snapshot dirs
    finally:
        shutil.rmtree(workspace, ignore_errors=True)
    rows = [(t, e, counts.get((t, e), (0, 0))[0], counts.get((t, e), (0, 0))[1])
            for t in tables for e in ("Insert", "Delete")]
    return spark.createDataFrame(
        rows, "tbl string, event string, n_events long, n_rows long")


# n_events is CONDITIONAL on the level's delta being non-empty: the
# engine fires NO event for a cascade level whose delta has zero rows
# (store stage-nonempty gate — same as the reference, which pushes a
# delta per table only when the hook produced one). A level whose
# predicate matches nothing therefore reports (0, 0), and the oracle
# must agree on ANY fixture, not just ones where every level is hit.
SQL_LISTEN_CASCADE_EVENTS = """
SELECT 'customer' AS tbl, 'Insert' AS event,
       CAST(CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_rows FROM customer
UNION ALL
SELECT 'customer', 'Delete', CASE WHEN count(*) > 0 THEN 1 ELSE 0 END,
       count(*) FROM customer WHERE c_nationkey = 5
UNION ALL
SELECT 'pos_bal', 'Insert', CASE WHEN count(*) > 0 THEN 1 ELSE 0 END,
       count(*) FROM customer WHERE c_acctbal > 0.0
UNION ALL
SELECT 'pos_bal', 'Delete', CASE WHEN count(*) > 0 THEN 1 ELSE 0 END,
       count(*) FROM customer
WHERE c_acctbal > 0.0 AND c_nationkey = 5
UNION ALL
SELECT 'big_bal', 'Insert', CASE WHEN count(*) > 0 THEN 1 ELSE 0 END,
       count(*) FROM customer WHERE c_acctbal > 5000.0
UNION ALL
SELECT 'big_bal', 'Delete', CASE WHEN count(*) > 0 THEN 1 ELSE 0 END,
       count(*) FROM customer
WHERE c_acctbal > 5000.0 AND c_nationkey = 5
"""


def q_listen_fanout(spark: SparkSession, sf: str) -> DataFrame:
    """Many-subscriber listen fan-out (VERDICT r9 #6; reference fans out
    per-client mpsc channels, listener_hook.rs:33-53): 64 ASYNCHRONOUS
    subscribers per (table, event) across the 3-level cascade — 384
    callbacks — over one bulk insert and one cascading delete. The
    engine stages ONE snapshot per (table, event, commit) shared by all
    64 (engine.py _notify), so delivery cost stays O(delta-count jobs),
    never O(subscribers × rows); each callback tallies its delivered
    row count from the staged snapshot's parquet footers (no Spark job
    per subscriber — the scale contract under test). The census must
    show every subscriber received every event with the full row set:
    n_deliveries = 64 × events, n_rows = 64 × level-predicate rows."""
    import shutil

    import pyarrow.parquet as _pq

    workspace = tempfile.mkdtemp(prefix="rdb_fanout_")
    counts: dict = {}
    n_subs = 64
    try:
        eng = Engine(spark, LISTEN_ENGINE_CFG, workspace=workspace)

        def tally(tbl, event):
            def cb(df):
                n = sum(
                    _pq.read_metadata(f.replace("file:", "")).num_rows
                    for f in df.inputFiles())
                calls, rows = counts.get((tbl, event), (0, 0))
                counts[(tbl, event)] = (calls + 1, rows + n)
            return cb

        tables = ("customer", "pos_bal", "big_bal")
        for t in tables:
            for e in ("Insert", "Delete"):
                for _ in range(n_subs):
                    eng.listen(t, e, tally(t, e), asynchronous=True)
        cust = load(spark, sf, "customer").select(
            F.col("c_custkey").cast("long"), "c_name",
            F.col("c_nationkey").cast("long"), "c_acctbal", "c_mktsegment")
        eng.insert_df("customer", cust)
        eng.delete("customer", "c_nationkey", 5)
        eng.flush_listeners()  # drain barrier + snapshot reap
        assert not eng.listener_errors, eng.listener_errors[:3]
    finally:
        shutil.rmtree(workspace, ignore_errors=True)
    rows = [(t, e, counts.get((t, e), (0, 0))[0], counts.get((t, e), (0, 0))[1])
            for t in tables for e in ("Insert", "Delete")]
    return spark.createDataFrame(
        rows, "tbl string, event string, n_deliveries long, n_rows long")


# 64 subscribers × the single-subscriber census (empty deltas fire no
# event, so a level whose predicate matches nothing reports 0 — the
# listen_cascade_events contract multiplied by the fan-out).
SQL_LISTEN_FANOUT = """
SELECT 'customer' AS tbl, 'Insert' AS event,
       CAST(64 * (CASE WHEN count(*) > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_deliveries,
       CAST(64 * count(*) AS BIGINT) AS n_rows FROM customer
UNION ALL
SELECT 'customer', 'Delete', 64 * (CASE WHEN count(*) > 0 THEN 1 ELSE 0 END),
       64 * count(*) FROM customer WHERE c_nationkey = 5
UNION ALL
SELECT 'pos_bal', 'Insert', 64 * (CASE WHEN count(*) > 0 THEN 1 ELSE 0 END),
       64 * count(*) FROM customer WHERE c_acctbal > 0.0
UNION ALL
SELECT 'pos_bal', 'Delete', 64 * (CASE WHEN count(*) > 0 THEN 1 ELSE 0 END),
       64 * count(*) FROM customer
WHERE c_acctbal > 0.0 AND c_nationkey = 5
UNION ALL
SELECT 'big_bal', 'Insert', 64 * (CASE WHEN count(*) > 0 THEN 1 ELSE 0 END),
       64 * count(*) FROM customer WHERE c_acctbal > 5000.0
UNION ALL
SELECT 'big_bal', 'Delete', 64 * (CASE WHEN count(*) > 0 THEN 1 ELSE 0 END),
       64 * count(*) FROM customer
WHERE c_acctbal > 5000.0 AND c_nationkey = 5
"""


# -- transaction rollback on failed cascade (VERDICT r9 #4) -------------------

TXN_ENGINE_CFG = {
    "tables": [
        {"Source": {"name": "customer", "columns": {
            "c_custkey": "Integer", "c_name": "Str", "c_nationkey": "Integer",
            "c_acctbal": "Float", "c_mktsegment": "Str"}}},
        {"Derived": {"name": "pos_bal",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "customer",
                         "filter": "c_acctbal > 0.0"}}}},
        {"Derived": {"name": "audit",
                     "transform_definition": {"ActionTransform": {
                         "name": "poison_gate",
                         "source_table": "customer"}}}},
    ]
}


def q_txn_rollback(spark: SparkSession, sf: str) -> DataFrame:
    """Rollback on failed cascade (the reference's TransactionManager
    invert-edit walk-back, database.rs:317-327,345-396; here a
    version-pointer restore, store.py begin_commit/rollback): commit 1
    inserts every nation≠5 customer and cascades through BOTH children
    (a Filter and an Arrow-batched Action). Commit 2 inserts the
    nation-5 customers; the action raises mid-cascade — AFTER the
    source append and the filter child's delta are staged — so the
    whole commit must walk back: every table reverts to its commit-1
    snapshot and no listener fires. The result is the post-failure
    census (rows + exact key checksum per table, plus whether commit 2
    raised); the oracle replays commit-1's predicate algebra from the
    raw fixture — one leaked staged file, a surviving version bump, or
    a missed raise breaks the match."""
    import shutil

    def poison_gate(pdf):
        if (pdf["c_nationkey"] == 5).any():
            raise ValueError("poison_gate: nation 5 is forbidden")
        return pdf

    workspace = tempfile.mkdtemp(prefix="rdb_txn_")
    try:
        eng = Engine(spark, TXN_ENGINE_CFG, workspace=workspace,
                     actions={"poison_gate": poison_gate})
        cust = load(spark, sf, "customer").select(
            F.col("c_custkey").cast("long"), "c_name",
            F.col("c_nationkey").cast("long"), "c_acctbal", "c_mktsegment")
        eng.insert_df("customer", cust.filter(F.col("c_nationkey") != 5))
        raised = 0
        try:
            eng.insert_df("customer", cust.filter(F.col("c_nationkey") == 5))
        except Exception:
            raised = 1
        rows = []
        for t in ("customer", "pos_bal", "audit"):
            n, s = eng.table(t).agg(
                F.count(F.lit(1)), F.sum("c_custkey")).collect()[0]
            rows.append((t, int(n), int(s or 0)))
        rows.append(("commit2_raised", raised, 0))
    finally:
        shutil.rmtree(workspace, ignore_errors=True)
    return spark.createDataFrame(
        rows, "tbl string, n_rows long, key_sum long")


# commit 2 raises IFF the fixture holds any nation-5 customer (an empty
# poison batch is a no-op commit); post-rollback state == commit-1 state.
SQL_TXN_ROLLBACK = """
SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(c_custkey), 0) AS BIGINT) AS key_sum
FROM customer WHERE c_nationkey <> 5
UNION ALL
SELECT 'pos_bal', count(*), CAST(coalesce(sum(c_custkey), 0) AS BIGINT)
FROM customer WHERE c_nationkey <> 5 AND c_acctbal > 0.0
UNION ALL
SELECT 'audit', count(*), CAST(coalesce(sum(c_custkey), 0) AS BIGINT)
FROM customer WHERE c_nationkey <> 5
UNION ALL
SELECT 'commit2_raised',
       CAST(CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS BIGINT),
       CAST(0 AS BIGINT)
FROM customer WHERE c_nationkey = 5
"""


# -- InsertData full cascade response (VERDICT r9 #4) --------------------------

INSERT_REPORT_CFG = {
    "tables": [
        {"Source": {"name": "orders", "columns": {
            "o_orderkey": "Integer", "o_custkey": "Integer",
            "o_totalprice": "Float", "o_orderstatus": "Str"}}},
        {"Derived": {"name": "open_orders",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "orders",
                         "filter": 'o_orderstatus == "O"'}}}},
        {"Derived": {"name": "cust_totals",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "open_orders",
                         "aggregated_column": "o_custkey",
                         "functions": ["n ~ memo.n + 1",
                                       "total ~ memo.total + o_totalprice"]}}}},
    ]
}


def q_insert_report(spark: SparkSession, sf: str) -> DataFrame:
    """InsertData's full cascade response (database.rs:189-194: insert
    returns the committed edits of EVERY table the cascade touched):
    two bulk inserts split the orders fixture by orderkey parity; the
    result is built from the SECOND insert's RETURNED report — not from
    reading tables — so it checks the response contract itself: a table
    appears iff its delta is nonempty, the filter child reports only
    passing rows, and the aggregation child reports the upsert as
    delete(old memo row, for keys commit 1 already created) +
    insert(new memo row) per touched key."""
    import shutil

    workspace = tempfile.mkdtemp(prefix="rdb_insrep_")
    try:
        eng = Engine(spark, INSERT_REPORT_CFG, workspace=workspace)
        orders = load(spark, sf, "orders").select(
            F.col("o_orderkey").cast("long"), F.col("o_custkey").cast("long"),
            "o_totalprice", "o_orderstatus")
        eng.insert_df("orders", orders.filter(F.col("o_orderkey") % 2 == 0))
        report = eng.insert_df(
            "orders", orders.filter(F.col("o_orderkey") % 2 == 1))
        rows = []
        for t in ("orders", "open_orders", "cust_totals"):
            d = report.get(t)
            rows.append((t, 1 if d is not None else 0,
                         d.num_inserted if d is not None else 0,
                         d.num_deleted if d is not None else 0))
    finally:
        shutil.rmtree(workspace, ignore_errors=True)
    return spark.createDataFrame(
        rows, "tbl string, present long, n_ins long, n_del long")


SQL_INSERT_REPORT = """
WITH b2 AS (SELECT * FROM orders WHERE o_orderkey % 2 = 1),
b2o AS (SELECT * FROM b2 WHERE o_orderstatus = 'O'),
b1o AS (SELECT * FROM orders
        WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'O'),
agg AS (
  SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_ins,
         CAST(count(DISTINCT CASE WHEN o_custkey IN
                (SELECT o_custkey FROM b1o) THEN o_custkey END)
              AS BIGINT) AS n_del
  FROM b2o WHERE o_custkey IS NOT NULL)
SELECT 'orders' AS tbl,
       CAST(CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS BIGINT) AS present,
       CAST(count(*) AS BIGINT) AS n_ins, CAST(0 AS BIGINT) AS n_del
FROM b2
UNION ALL
SELECT 'open_orders', CASE WHEN count(*) > 0 THEN 1 ELSE 0 END,
       count(*), 0 FROM b2o
UNION ALL
SELECT 'cust_totals',
       CAST(CASE WHEN n_ins + n_del > 0 THEN 1 ELSE 0 END AS BIGINT),
       n_ins, n_del
FROM agg
"""


# -- full wire-protocol roundtrip under the driver's hostile axes -------------

WIRE_ENGINE_CFG = {
    "tables": [
        {"Source": {"name": "customer", "columns": {
            "c_custkey": "Integer", "c_name": "Str", "c_nationkey": "Integer",
            "c_acctbal": "Decimal", "c_mktsegment": "Str"}}},
        {"Derived": {"name": "pos_bal",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "customer",
                         "filter": "c_acctbal > 0.0"}}}},
    ]
}


class _WireClient:
    """Minimal reference-protocol client (u32-BE frame + JSON envelope,
    the reference Python client's framing, client.py:18-28) — the suite
    must not import from tests/, so the ~20 lines live here."""

    def __init__(self, host: str, port: int):
        import socket

        self.sock = socket.create_connection((host, port))

    def close(self) -> None:
        self.sock.close()

    def request(self, query: dict) -> dict:
        import json as _json
        import socket as _socket
        import struct as _struct
        import uuid as _uuid2

        rid = str(_uuid2.uuid4())
        body = _json.dumps(
            {"Query": {"request_id": rid, "query": query}}).encode()
        self.sock.sendall(_struct.pack(">I", len(body)) + body)
        header = self.sock.recv(4, _socket.MSG_WAITALL)
        (size,) = _struct.unpack(">I", header)
        buf = b""
        while len(buf) < size:
            buf += self.sock.recv(size - len(buf))
        resp = _json.loads(buf.decode())
        assert resp["RequestResponse"]["request_id"] == rid
        return resp["RequestResponse"]["response"]


def _entry_census(entries: list[dict]) -> tuple[int, int]:
    """(row count, Σ c_custkey) over wire entries — the value the oracle
    recomputes from the raw fixture."""
    total = 0
    for e in entries:
        v = e.get("c_custkey")
        total += int(v["Integer"]) if isinstance(v, dict) else 0
    return len(entries), total


def q_wire_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end wire-protocol drive (VERDICT r10 #5): the TCP server
    (networking/server.py, reference framing network_types.rs:6-30) under
    the SAME hostile session the driver uses — insert via InsertData →
    cascade into a Decimal-typed filter child → DeleteData → every query
    verb (FindOne/GetAll/LessThan/GreaterThan) answered over the socket.

    The fixture's bulk (c_custkey > 3) loads through ``insert_df`` (the
    declared bulk path — per-row TCP is the reference's protocol for
    clients, not for ingest); the boundary rows 1-3 travel the full
    client protocol: floats tagged as Decimal strings (the reference has
    no runtime Float, types.rs:28), responses are the serde-style
    ManyResults(Ok([entries])) carrying the WHOLE cascade (the insert
    report contract, database.rs:189-194). The census tallies, per wire
    op, the entry count and Σ c_custkey of what came back OVER THE
    SOCKET — a dropped frame, a missed cascade entry, a wrong verb bound
    (strict < vs inclusive >=), or a non-roundtripping value encoding
    breaks the hash against DuckDB's replay of the same algebra."""
    import shutil

    workspace = tempfile.mkdtemp(prefix="rdb_wire_")
    rows = []
    try:
        eng = Engine(spark, WIRE_ENGINE_CFG, workspace=workspace)
        srv = None
        try:
            from reactivedb_spark.networking import ReactiveDBServer

            srv = ReactiveDBServer(eng).start()
            cust = load(spark, sf, "customer").select(
                F.col("c_custkey").cast("long"), "c_name",
                F.col("c_nationkey").cast("long"),
                F.col("c_acctbal").cast("decimal(38,18)"), "c_mktsegment")
            eng.insert_df("customer", cust.filter(F.col("c_custkey") > 3))

            cli = _WireClient(srv.host, srv.port)
            boundary = (cust.filter(F.col("c_custkey") <= 3)
                        .orderBy("c_custkey").collect())
            ins_entries: list[dict] = []
            for r in boundary:
                entry = {
                    "c_custkey": {"Integer": int(r.c_custkey)},
                    "c_name": {"Str": r.c_name},
                    "c_nationkey": {"Integer": int(r.c_nationkey)},
                    "c_acctbal": {"Decimal": str(r.c_acctbal)},
                    "c_mktsegment": {"Str": r.c_mktsegment},
                }
                resp = cli.request(
                    {"InsertData": {"table": "customer", "entry": entry}})
                ins_entries.extend(resp["ManyResults"]["Ok"])
            rows.append(("wire_insert_entries",) + _entry_census(ins_entries))

            resp = cli.request({"DeleteData": {
                "table": "customer", "column": "c_custkey",
                "key": {"Integer": 2}}})
            rows.append(("wire_delete_entries",)
                        + _entry_census(resp["ManyResults"]["Ok"]))

            one = cli.request({"FindOne": {
                "table": "customer", "column": "c_custkey",
                "key": {"Integer": 1}}})["OneResult"]["Ok"]
            rows.append(("findone_c1",) + _entry_census([one] if one else []))

            for op, query in (
                ("getall_nation7",
                 {"GetAll": {"table": "customer", "column": "c_nationkey",
                             "key": {"Integer": 7}}}),
                ("lessthan_c10",
                 {"LessThan": {"table": "customer", "column": "c_custkey",
                               "key": {"Integer": 10}}}),
                ("greaterthan_c100",
                 {"GreaterThan": {"table": "customer", "column": "c_custkey",
                                  "key": {"Integer": 100}}}),
                ("getall_posbal_n7",
                 {"GetAll": {"table": "pos_bal", "column": "c_nationkey",
                             "key": {"Integer": 7}}}),
            ):
                resp = cli.request(query)
                rows.append((op,) + _entry_census(resp["ManyResults"]["Ok"]))
            cli.close()
        finally:
            if srv is not None:
                srv.shutdown()
    finally:
        shutil.rmtree(workspace, ignore_errors=True)
    return spark.createDataFrame(
        rows, "op string, n_rows long, key_sum long")


# the oracle replays the same algebra from the raw fixture: the insert
# report carries 1 customer + (1 pos_bal iff acctbal > 0) per boundary
# row; the delete report mirrors it for custkey 2; the verb censuses run
# against the post-delete state (fixture minus custkey 2).
SQL_WIRE_ROUNDTRIP = """
SELECT 'wire_insert_entries' AS op,
       CAST(count(*)
            + sum(CASE WHEN c_acctbal > 0.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rows,
       CAST(sum(c_custkey)
            + sum(CASE WHEN c_acctbal > 0.0 THEN c_custkey ELSE 0 END)
            AS BIGINT) AS key_sum
FROM customer WHERE c_custkey <= 3
UNION ALL
SELECT 'wire_delete_entries',
       CAST(coalesce(sum(1 + CASE WHEN c_acctbal > 0.0 THEN 1 ELSE 0 END), 0)
            AS BIGINT),
       CAST(coalesce(sum(c_custkey
            * (1 + CASE WHEN c_acctbal > 0.0 THEN 1 ELSE 0 END)), 0)
            AS BIGINT)
FROM customer WHERE c_custkey = 2
UNION ALL
SELECT 'findone_c1', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(c_custkey), 0) AS BIGINT)
FROM customer WHERE c_custkey = 1
UNION ALL
SELECT 'getall_nation7', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(c_custkey), 0) AS BIGINT)
FROM customer WHERE c_custkey <> 2 AND c_nationkey = 7
UNION ALL
SELECT 'lessthan_c10', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(c_custkey), 0) AS BIGINT)
FROM customer WHERE c_custkey <> 2 AND c_custkey < 10
UNION ALL
SELECT 'greaterthan_c100', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(c_custkey), 0) AS BIGINT)
FROM customer WHERE c_custkey <> 2 AND c_custkey >= 100
UNION ALL
SELECT 'getall_posbal_n7', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(c_custkey), 0) AS BIGINT)
FROM customer
WHERE c_custkey <> 2 AND c_nationkey = 7 AND c_acctbal > 0.0
"""


QUERIES = {
    "function_transform": q_function_transform,
    "filter_transform": q_filter_transform,
    "union_transform": q_union_transform,
    "aggregation_transform": q_aggregation_transform,
    "find_one": q_find_one,
    "get_all": q_get_all,
    "less_than": q_less_than,
    "greater_than": q_greater_than,
    "delete_cascade": q_delete_cascade,
    "action_transform": q_action_transform,
    "expr_arithmetic": q_expr_arithmetic,
    "expr_functions": q_expr_functions,
    "array_filter_dsl": q_array_filter_dsl,
    "struct_map_project": q_struct_map_project,
    "listen_cascade_events": q_listen_cascade_events,
    "txn_rollback": q_txn_rollback,
    "insert_report": q_insert_report,
    "listen_fanout": q_listen_fanout,
    "wire_roundtrip": q_wire_roundtrip,
}

ORACLES = {
    "function_transform": SQL_FUNCTION_TRANSFORM,
    "filter_transform": SQL_FILTER_TRANSFORM,
    "union_transform": SQL_UNION_TRANSFORM,
    "aggregation_transform": SQL_AGGREGATION_TRANSFORM,
    "find_one": SQL_FIND_ONE,
    "get_all": SQL_GET_ALL,
    "less_than": SQL_LESS_THAN,
    "greater_than": SQL_GREATER_THAN,
    "delete_cascade": SQL_DELETE_CASCADE,
    "action_transform": SQL_ACTION_TRANSFORM,
    "array_filter_dsl": SQL_ARRAY_FILTER_DSL,
    "expr_arithmetic": SQL_EXPR_ARITHMETIC,
    "expr_functions": SQL_EXPR_FUNCTIONS,
    "struct_map_project": SQL_STRUCT_MAP_PROJECT,
    "listen_cascade_events": SQL_LISTEN_CASCADE_EVENTS,
    "txn_rollback": SQL_TXN_ROLLBACK,
    "insert_report": SQL_INSERT_REPORT,
    "listen_fanout": SQL_LISTEN_FANOUT,
    "wire_roundtrip": SQL_WIRE_ROUNDTRIP,
}
