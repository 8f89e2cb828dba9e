"""YAML config front-end, shape-compatible with the reference
(reactive_db/src/config/config_reader.rs:8-85; example test_cfg.yaml).

A config is::

    tables:
      - Source:
          name: users
          columns: {name: Str, age: Integer}
      - Derived:
          name: derived
          transform_definition:
            FunctionTransform:
              source_table: users
              functions: ["newColumn ~ age + 2"]
    storage_destination: db/          # optional here
    action_config:                    # optional; Inline only
      Inline:
        actions: [{name: A, file: mod, function: fn}]

We additionally accept Python callables registered programmatically for
actions (the reference embeds CPython; we use Arrow-vectorized
``mapInPandas`` — SURVEY.md §2.1 ActionTransform row).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from reactivedb_spark.errors import ConfigError
from reactivedb_spark.expr.parser import Assignment, Comparison, parse_statement


@dataclass(frozen=True)
class SourceTableConfig:
    name: str
    columns: dict  # name -> type spec (str or nested dict)


@dataclass(frozen=True)
class FunctionTransformConfig:
    source_table: str
    functions: tuple  # tuple[Assignment, ...]


@dataclass(frozen=True)
class FilterTransformConfig:
    source_table: str
    filter: object  # Comparison statement


@dataclass(frozen=True)
class UnionTransformConfig:
    tables_and_foreign_keys: tuple  # tuple[(table, fk_col), ...]


@dataclass(frozen=True)
class AggregationTransformConfig:
    source_table: str
    aggregated_column: str
    functions: tuple  # tuple[Assignment, ...]


@dataclass(frozen=True)
class ActionTransformConfig:
    name: str
    source_table: str


@dataclass(frozen=True)
class JoinTransformConfig:
    """Extension transform (no reference analogue — the reference's only
    multi-parent operator is UnionTransform, transform.rs:41-58): an
    incrementally maintained INNER equi-join of two declared tables.
    Delta rule: Δ(L⋈R) = ΔL⋈R_new ∪ (L_new−ΔL)⋈ΔR — exact for ANY
    DAG shape, including shared-ancestry diamonds, because propagation
    is wave-aware: the engine commits every parent's delta before the
    join child pops in topo order, then applies the whole wave at once
    (Engine._apply_join_wave), so ΔL×ΔR pairs are counted exactly
    once. Only true self-joins (left_table == right_table) are
    rejected."""

    left_table: str
    right_table: str
    left_on: str
    right_on: str


@dataclass(frozen=True)
class DedupTransformConfig:
    """Extension transform (no reference analogue — SURVEY.md §7 phase 6:
    the training-data operators exposed through the same config surface):
    the derived table holds ONE representative row per distinct normalized
    ``key`` value, first writer wins."""

    source_table: str
    key: str


@dataclass(frozen=True)
class DistinctTransformConfig:
    """Extension transform #6: reference-counted multi-column DISTINCT —
    one derived row per distinct live tuple of the projected
    ``columns``, maintained by the classic counted-projection of
    incremental view maintenance. Both insert and delete application
    are O(delta) keyed aggregations; the delete path never reads the
    parent (the refcount is its own sufficient summary). Downstream
    deltas fire only on 0↔1 refcount transitions."""

    source_table: str
    columns: tuple


@dataclass(frozen=True)
class TopKTransformConfig:
    """Extension transform #5: incrementally maintained per-group top-k —
    the derived table holds the ``k`` live parent rows ranking highest
    by ``order_by`` per distinct ``group_by`` value (``descending=False``
    flips to lowest-first; ties break by arrival order). Inserts are
    O(delta) by top-k monotonicity — top-k(S ∪ Δ) = top-k(top-k(S) ∪ Δ) —
    so the child state is its own sufficient summary; only parent
    deletes refill from the parent, restricted to the losing groups."""

    source_table: str
    group_by: str
    order_by: str
    k: int
    descending: bool = True


@dataclass(frozen=True)
class SampleTransformConfig:
    """Extension transform #2: deterministic hash sample — keep a row iff
    ``md5(key) mod 100 < rate_pct`` (repeatable, join-consistent)."""

    source_table: str
    key: str
    rate_pct: int


@dataclass(frozen=True)
class TextStatsTransformConfig:
    """Extension transform #4: per-document text metrics (token/char
    counts, alpha ratio, quality score, language guess, fingerprint) as
    a stateless rowwise derived table."""

    source_table: str
    text_column: str


@dataclass(frozen=True)
class ChunkTransformConfig:
    """Extension transform #3: fixed-size token chunking with overlap —
    each source row derives ``ceil((n - overlap) / stride)`` chunk rows
    (context-window preprocessing as a reactive derived table)."""

    source_table: str
    text_column: str
    chunk_size: int
    overlap: int


@dataclass(frozen=True)
class DerivedTableConfig:
    name: str
    transform: object


@dataclass(frozen=True)
class ActionConfig:
    name: str
    file: str
    function: str


@dataclass(frozen=True)
class DbConfig:
    sources: tuple = ()
    derived: tuple = ()
    actions: dict = field(default_factory=dict)  # name -> ActionConfig
    storage_destination: str | None = None
    actions_workspace: str | None = None  # Inline action_config workspace_dir

    @property
    def table_names(self):
        return [t.name for t in self.sources] + [t.name for t in self.derived]


def _parse_assignments(exprs, ctx: str):
    out = []
    for e in exprs:
        st = parse_statement(e)
        if not isinstance(st, Assignment):
            raise ConfigError(f"{ctx}: expected 'dest ~ expr' assignment, got {e!r}")
        out.append(st)
    return tuple(out)


def _one_variant(d, ctx: str):
    if not isinstance(d, dict) or len(d) != 1:
        raise ConfigError(f"{ctx}: expected a single-variant mapping, got {d!r}")
    return next(iter(d.items()))


def parse_transform(spec, name: str):
    kind, body = _one_variant(spec, f"table {name} transform_definition")
    if kind == "FunctionTransform":
        return FunctionTransformConfig(
            body["source_table"], _parse_assignments(body["functions"], name)
        )
    if kind == "FilterTransform":
        st = parse_statement(body["filter"])
        if isinstance(st, Assignment):
            raise ConfigError(f"table {name}: filter must be a boolean expression")
        assert isinstance(st, Comparison)
        return FilterTransformConfig(body["source_table"], st)
    if kind == "UnionTransform":
        pairs = tuple((t, fk) for t, fk in body["tables_and_foreign_keys"])
        if len(pairs) < 1:
            raise ConfigError(f"table {name}: UnionTransform needs >=1 parent")
        return UnionTransformConfig(pairs)
    if kind == "AggregationTransform":
        functions = _parse_assignments(body["functions"], name)
        for st in functions:
            # The incremental merge plan joins prior state on internal
            # columns `_k` / `_matched` / `_o_<dest>` (aggregation.py);
            # a user dest with one of those names would make the merged
            # frame's column references ambiguous at runtime (ADVICE r12).
            if st.dest in ("_k", "_matched") or st.dest.startswith("_o_"):
                raise ConfigError(
                    f"table {name}: aggregation dest {st.dest!r} collides "
                    "with internal merge columns (_k, _matched, _o_*)"
                )
        return AggregationTransformConfig(
            body["source_table"],
            body["aggregated_column"],
            functions,
        )
    if kind == "ActionTransform":
        return ActionTransformConfig(body["name"], body["source_table"])
    if kind == "DedupTransform":
        return DedupTransformConfig(body["source_table"], body["key"])
    if kind == "DistinctTransform":
        cols = tuple(body["columns"])
        if not cols:
            raise ConfigError(
                f"table {name}: DistinctTransform needs >=1 column"
            )
        return DistinctTransformConfig(body["source_table"], cols)
    if kind == "JoinTransform":
        jt = JoinTransformConfig(
            body["left_table"], body["right_table"],
            body["left_on"], body["right_on"],
        )
        if jt.left_table == jt.right_table:
            raise ConfigError(
                f"table {name}: JoinTransform self-joins are not supported"
            )
        return jt
    if kind == "SampleTransform":
        return SampleTransformConfig(
            body["source_table"], body["key"], int(body["rate_pct"])
        )
    if kind == "TopKTransform":
        k = int(body["k"])
        if k < 1:
            raise ConfigError(f"table {name}: TopKTransform k must be >= 1")
        return TopKTransformConfig(
            body["source_table"], body["group_by"], body["order_by"],
            k, bool(body.get("descending", True)),
        )
    if kind == "TextStatsTransform":
        return TextStatsTransformConfig(body["source_table"], body["text_column"])
    if kind == "ChunkTransform":
        return ChunkTransformConfig(
            body["source_table"], body["text_column"],
            int(body.get("chunk_size", 64)), int(body.get("overlap", 16)),
        )
    raise ConfigError(f"table {name}: unknown transform type {kind!r}")


def parse_config(doc: dict) -> DbConfig:
    sources, derived = [], []
    for entry in doc.get("tables", []):
        kind, body = _one_variant(entry, "tables[]")
        if kind == "Source":
            sources.append(SourceTableConfig(body["name"], dict(body["columns"])))
        elif kind == "Derived":
            derived.append(
                DerivedTableConfig(body["name"], parse_transform(body["transform_definition"], body["name"]))
            )
        else:
            raise ConfigError(f"unknown table kind {kind!r}")
    actions = {}
    workspace_dir = None
    ac = doc.get("action_config")
    if ac:
        kind, body = _one_variant(ac, "action_config")
        if kind != "Inline":
            raise ConfigError("only Inline action_config is supported (Import: declared out of scope)")
        workspace_dir = body.get("workspace_dir")
        for a in body.get("actions", []):
            actions[a["name"]] = ActionConfig(a["name"], a["file"], a["function"])
    names = [s.name for s in sources] + [d.name for d in derived]
    if len(set(names)) != len(names):
        raise ConfigError(f"duplicate table names in config: {names}")
    return DbConfig(tuple(sources), tuple(derived), actions,
                    doc.get("storage_destination"), workspace_dir)


def load_config(path: str) -> DbConfig:
    import yaml

    with open(path) as f:
        return parse_config(yaml.safe_load(f))
