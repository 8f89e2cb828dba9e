"""Similarity search over embedding columns (``array<float>``).

Engine-portable determinism is the design constraint (results must
hash-match a DuckDB oracle): element values go float → double →
``DECIMAL(12,8)`` once, and every reduction (dot products, norms) is a
**decimal sum — exact and order-independent** — so partition order can
never change a result bit. Only the final cosine is computed in doubles
(single deterministic expression). The float→decimal path deliberately
routes through double: DuckDB's float→decimal cast multiplies in float
precision and loses digits.

Two search paths:

- ``cosine_topk``: brute-force scan against one query vector — a narrow
  map + one broadcast join; linear in corpus size, the right baseline at
  any scale.
- ``lsh_buckets`` / ``cosine_pairs``: random-hyperplane LSH (signs derived
  from md5, so any SQL engine can reproduce them) buckets vectors by the
  sign pattern of 8 projections; near-dup search only pairs bucket-mates —
  the scale path (shuffle on bucket key instead of O(n²)).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F

from reactivedb_spark import cache

N_PLANES = 8
_ELEM_DEC = "decimal(12,8)"
# ivf_assignments: max centroid ELEMENTS (k·dim) inlined as Catalyst
# literals; beyond this the assignment is a broadcast join (VERDICT r7:
# k=4297·d=64 would otherwise build a >10⁵-node expression tree).
_IVF_LITERAL_MAX_TERMS = 8192


def plane_sign(i: int, j: int) -> int:
    """Deterministic ±1 from md5("p{i}_{j}") first hex char high bit —
    reproducible in any engine with md5()."""
    return 1 if hashlib.md5(f"p{i}_{j}".encode()).hexdigest()[0] in "89abcdef" else -1


def exploded(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, j [1-based], xl long) element rows.

    Elements are fixed-point **long micro-units** (value × 10⁸ after the
    float→double→decimal(12,8) rounding): int64 sums/dot-products are
    exact and order-independent like decimals but aggregate at ALU speed.
    Headroom: |x| < 10⁴ ⇒ |x·y·10¹⁶| ≤ 10²⁴?… for unit-norm embeddings
    |x| ≤ 1 ⇒ per-term ≤ 10¹⁶, 64-dim dot ≤ 6.4·10¹⁷ < 2⁶³.

    Callers feeding a RAW single-file scan should pre-widen it
    (``dedup.widen`` at the scan call site); this function is also applied
    to joined/candidate frames, where widen's ``df.rdd`` partition probe
    would force an expensive non-AQE plan compile for no benefit.
    """
    return df.select(id_col, vec_col).select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).select(
        F.col(id_col),
        (F.col("pos") + 1).cast("int").alias("j"),
        (F.col("x").cast("double").cast(_ELEM_DEC) * 100_000_000)
        .cast("long")
        .alias("xl"),
    )


def norms2(elem: DataFrame, id_col: str) -> DataFrame:
    """Σ x² in fixed-point (scale 10¹⁶)."""
    return elem.groupBy(id_col).agg(F.sum(F.col("xl") * F.col("xl")).alias("n2"))


_SCALE2 = 1e16  # squared fixed-point scale


def _cosine(dot_col: Column, na_col: Column, nb_col: Column) -> Column:
    # identical expression on the DuckDB side; round(9) absorbs any
    # last-ulp divergence in the double conversions
    return F.round(
        (dot_col.cast("double") / F.lit(_SCALE2))
        / (
            F.sqrt(na_col.cast("double") / F.lit(_SCALE2))
            * F.sqrt(nb_col.cast("double") / F.lit(_SCALE2))
        ),
        9,
    )


def cosine_topk(df: DataFrame, id_col: str, vec_col: str, query_id, k: int = 10) -> DataFrame:
    """Top-k rows by cosine similarity to the row with ``id == query_id``
    (query row excluded); ties broken by id ascending.

    ``elem`` feeds two branches of one plan (the broadcast query side and
    the corpus dot-product side), so it is persisted — without it the
    scan + posexplode would run once per branch. The query's own norm is
    folded into the q branch (Σ ql²) rather than being a third scan."""
    elem = cache.pin(exploded(df, id_col, vec_col))
    q = elem.filter(F.col(id_col) == F.lit(query_id)).select(
        F.col("j"), F.col("xl").alias("ql")
    )
    dots = (
        elem.filter(F.col(id_col) != F.lit(query_id))
        .join(F.broadcast(q), "j")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("xl") * F.col("ql")).alias("dot"),
            F.sum(F.col("xl") * F.col("xl")).alias("n2"),
        )
    )
    qn = q.agg(F.sum(F.col("ql") * F.col("ql")).alias("qn2"))
    out = dots.crossJoin(F.broadcast(qn)).select(
        F.col(id_col),
        _cosine(F.col("dot"), F.col("n2"), F.col("qn2")).alias("cos_sim"),
    )
    return out.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def lsh_buckets(df: DataFrame, id_col: str, vec_col: str, planes: int = N_PLANES) -> DataFrame:
    """Random-hyperplane bucket signature per vector: one narrow explode,
    one broadcast join with the (plane, dim, sign) constants, one hash
    aggregation."""
    spark = df.sparkSession
    dims = len(df.select(vec_col).first()[0])
    signs = spark.createDataFrame(
        [(i, j, plane_sign(i, j)) for i in range(1, planes + 1) for j in range(1, dims + 1)],
        "i int, j int, sign int",
    )
    elem = exploded(df, id_col, vec_col)
    joined = elem.join(F.broadcast(signs), "j")
    aggs = [
        F.sum(F.when(F.col("i") == i, F.col("sign") * F.col("xl"))).alias(f"d{i}")
        for i in range(1, planes + 1)
    ]
    dots = joined.groupBy(id_col).agg(*aggs)
    bucket = F.concat(
        *[F.when(F.col(f"d{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(1, planes + 1)]
    )
    return dots.select(F.col(id_col), bucket.alias("bucket"))


def ivf_assignments(df: DataFrame, id_col: str, vec_col: str,
                    k: int = 16, iters: int = 2):
    """IVF coarse quantizer: k-means-lite clustering, fully deterministic.

    - init: the k lowest-id vectors are the seed centroids;
    - assignment: squared L2 to each centroid via a sequential
      ``zip_with``/``aggregate`` fold (deterministic order), argmin with
      id tie-break via array_min over (dist, idx) structs;
    - update: per-dimension means from **decimal sums** (exact,
      partition-order-proof) — centroids are tiny (k×dim) and come back
      to the driver, everything else stays distributed.

    Returns (assignments DataFrame [id, cluster], centroids list).

    Assignment strategy (ADVICE/VERDICT r7): the k·dim centroid values
    are inlined as Catalyst literals ONLY below
    ``_IVF_LITERAL_MAX_TERMS`` — that path is shuffle-free but its plan
    grows one expression node per centroid element, so large k would
    build a 10⁵⁺-node tree. Past the threshold, assignment delegates to
    a broadcast join against a (cluster, centroid-array) relation: one
    broadcast of k·dim doubles, one keyed min aggregation — the same
    ``zip_with``/``aggregate`` fold in the same sequential order, and
    the same (d2, cluster) struct argmin, so both paths are
    IEEE-identical; only the plan shape differs.
    """
    dim = len(df.select(vec_col).first()[0])
    seeds = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in seeds]
    spark = df.sparkSession

    def _d2(vec, cent):
        return F.aggregate(
            F.zip_with(vec, cent, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def assign(cents) -> DataFrame:
        if len(cents) * dim <= _IVF_LITERAL_MAX_TERMS:
            dists = []
            for ci, c in enumerate(cents):
                carr = F.array(*[F.lit(float(x)) for x in c])
                d2 = _d2(F.col(vec_col).cast("array<double>"), carr)
                dists.append(F.struct(d2.alias("d"), F.lit(ci).alias("c")))
            best = F.array_min(F.array(*dists))["c"]
            return df.select(F.col(id_col), F.col(vec_col), best.alias("cluster"))
        cent_df = spark.createDataFrame(
            [(ci, c) for ci, c in enumerate(cents)],
            "_ci int, _cl array<double>",
        )
        dc = F.struct(
            _d2(F.col(vec_col).cast("array<double>"), F.col("_cl")).alias("d"),
            F.col("_ci").alias("c"),
        )
        best = (
            df.select(id_col, vec_col)
            .crossJoin(F.broadcast(cent_df))
            .groupBy(id_col)
            .agg(F.min(dc).alias("_dc"))
            .select(F.col(id_col), F.col("_dc")["c"].alias("cluster"))
        )
        return df.select(id_col, vec_col).join(best, id_col)

    for _ in range(iters):
        a = assign(centroids)
        sums = (
            a.select("cluster", F.posexplode(F.col(vec_col)).alias("j", "x"))
            .groupBy("cluster", "j")
            .agg(
                F.sum(F.col("x").cast("double").cast("decimal(20,10)")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new_cents = [list(c) for c in centroids]
        agg: dict[int, dict[int, tuple]] = {}
        for r in sums:
            agg.setdefault(r["cluster"], {})[r["j"]] = (r["s"], r["n"])
        for ci, dims in agg.items():
            new_cents[ci] = [
                float(dims[j][0] / dims[j][1]) if j in dims else centroids[ci][j]
                for j in range(dim)
            ]
        centroids = new_cents
    return assign(centroids).select(id_col, "cluster"), centroids


def ivf_topk(df: DataFrame, id_col: str, vec_col: str, query_id,
             k: int = 10, n_clusters: int = 16, nprobe: int = 4) -> DataFrame:
    """ANN top-k: probe only the ``nprobe`` clusters nearest the query,
    then exact cosine within the candidate set — the IVF scale path
    (scan cost ~ nprobe/n_clusters of the corpus). Brute-force
    ``cosine_topk`` is the recall baseline."""
    assignments, centroids = ivf_assignments(df, id_col, vec_col, k=n_clusters)
    q = df.filter(F.col(id_col) == F.lit(query_id)).select(vec_col).first()
    qv = [float(x) for x in q[0]]
    scored = sorted(
        range(len(centroids)),
        key=lambda ci: sum((a - b) ** 2 for a, b in zip(centroids[ci], qv)),
    )
    probe = scored[:nprobe]
    cand = df.join(
        assignments.filter(F.col("cluster").isin(probe)).select(id_col), id_col
    ).unionByName(df.filter(F.col(id_col) == F.lit(query_id))).distinct()
    return cosine_topk(cand, id_col, vec_col, query_id, k=k)


def _seed_cents(df: DataFrame, id_col: str, vec_col: str, k: int) -> list:
    """The ``k`` lowest-id vectors in fixed-point longs, collected to the
    driver — k·d longs, bounded like :func:`seed_assignments2`'s seed
    pull. One job with a limit, instead of deriving the centroid
    relation by a full scan → explode → join of the corpus (which ran
    once per consumer because broadcast builds defeat exchange reuse).
    Returns [(cluster_idx, [xl, ...]), ...] in id order."""
    rows = (
        df.select(F.col(id_col), _xl_array(vec_col).alias("vl"))
        .orderBy(id_col).limit(int(k)).collect()
    )
    return [(ci, [int(x) for x in r["vl"]]) for ci, r in enumerate(rows)]


def seed_assignments(df: DataFrame, id_col: str, vec_col: str,
                     n_clusters: int = 16) -> tuple:
    """Cluster assignment against SEED centroids (the ``n_clusters``
    lowest-id vectors) in **exact int64 fixed-point squared L2**
    (elements are xl = round(x·10⁸); (xl−cl)² ≤ 4·10¹⁶ and ×64 dims
    ≤ 2.6·10¹⁸ < 2⁶³), so cluster membership is bit-reproducible in any
    engine — no float k-means means in the compare path. The k seed
    VECTORS (k·d longs, bounded) come back to the driver and return as
    a literal relation: the earlier shape derived the centroid side
    from a second full scan+explode of the corpus.

    Returns (assign DataFrame [id, cluster], d2 DataFrame
    [id, cluster, d2]) — callers needing probe selection reuse d2."""
    from pyspark.sql import Window as W

    spark = df.sparkSession
    elem = exploded(df, id_col, vec_col)
    cent = spark.createDataFrame(
        [(ci, j + 1, xl) for ci, vl in _seed_cents(df, id_col, vec_col, n_clusters)
         for j, xl in enumerate(vl)],
        "cluster int, j int, cl long",
    )
    d2 = (
        elem.join(F.broadcast(cent), "j")
        .groupBy(id_col, "cluster")
        .agg(F.sum((F.col("xl") - F.col("cl")) * (F.col("xl") - F.col("cl"))).alias("d2"))
    )
    assign = d2.withColumn(
        "rn", F.row_number().over(W.partitionBy(id_col).orderBy("d2", "cluster"))
    ).filter(F.col("rn") == 1).select(id_col, "cluster")
    return assign, d2


def seed_assignments2(df: DataFrame, id_col: str, vec_col: str,
                      n_clusters: int) -> DataFrame:
    """Two-level exact fixed-point quantizer — the scale path for large
    ``n_clusters`` (k ∝ corpus size, as :func:`semantic_dedup` needs).

    A flat nearest-seed scan costs n·k·d distance terms; with k ∝ n that
    is quadratic in the corpus. Here: level 1 assigns every vector to the
    nearest of s = ⌈√k⌉ SUPER-seeds, level 2 to the nearest of the seeds
    whose own super-assignment matches — n·(s + k/s)·d ≈ 2n·√k·d terms,
    the 2-level rung of the hierarchical-k-means ladder (log-depth would
    make it n·log k; 2 levels suffice through sf10). The cell rule is
    "nearest seed within the nearest super-seed's cell", not global
    nearest-seed — a deterministic space partition, which is all SemDeDup
    needs from its (itself approximate) k-means stage.

    Exactness: seeds are the k lowest-id vectors, super-seeds the first s
    of those; distances are int64 fixed-point squared L2 (element path of
    :func:`exploded`); argmins break ties by (d2, index) via ``min_by``
    over an int struct — bit-reproducible in any engine. The k seed
    vectors (k·d longs, k ≪ n) are the only driver pull; the seed→super
    table is computed driver-side in exact int math and broadcast.

    Returns assignment DataFrame (id, cluster). Plan shape: two keyed
    groupBy shuffles of n narrow rows; both joins broadcast (s-row super
    table, k-row seed table)."""
    spark = df.sparkSession
    k = int(n_clusters)
    vecs = df.select(F.col(id_col), _xl_array(vec_col).alias("vl"))
    seed_rows = vecs.orderBy(id_col).limit(k).collect()  # k·d longs, k ≪ n
    # Clamp to the rows that exist (ADVICE r7): a corpus smaller than k
    # (or than ⌈√k⌉) must train with every row as a seed, not index past
    # the collected list; s is recomputed from the CLAMPED k.
    if not seed_rows:
        raise ValueError("seed_assignments2: empty input relation")
    k = min(k, len(seed_rows))
    s = min(_ceil_sqrt(k), k)
    seed_vls = [[int(x) for x in r["vl"]] for r in seed_rows[:k]]
    # seed → super assignment in exact driver-side int math (k·s·d ops)
    seed_g = []
    for ci, sv in enumerate(seed_vls):
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(sv, seed_vls[si])), si)
            for si in range(s)
        )
        seed_g.append((ci, best[1]))
    sup = spark.createDataFrame(
        [(si, seed_vls[si]) for si in range(s)], "sidx int, sl array<long>"
    )
    cent = spark.createDataFrame(
        [(ci, g, seed_vls[ci]) for ci, g in seed_g],
        "cluster int, g int, cl array<long>",
    )
    d2_sup = F.aggregate(
        F.zip_with("vl", "sl", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    lvl1 = (
        vecs.crossJoin(F.broadcast(sup))
        .select(F.col(id_col), "vl", F.col("sidx"), d2_sup.alias("d2"))
        .groupBy(id_col)
        .agg(
            F.min_by("sidx", F.struct("d2", "sidx")).alias("g"),
            F.first("vl").alias("vl"),
        )
    )
    d2_cent = F.aggregate(
        F.zip_with("vl", "cl", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    return (
        lvl1.join(F.broadcast(cent), "g")
        .select(F.col(id_col), F.col("cluster"), d2_cent.alias("d2"))
        .groupBy(id_col)
        .agg(F.min_by("cluster", F.struct("d2", "cluster")).alias("cluster"))
    )


def _ceil_sqrt(k: int) -> int:
    """Smallest s with s² ≥ k — integer-exact (no float sqrt: the oracle
    replays ``MIN(i) WHERE i*i >= k``, and double sqrt of a perfect
    square can land an ulp off either side of the integer)."""
    import math

    return math.isqrt(k - 1) + 1 if k > 1 else 1


def semantic_dedup(df: DataFrame, id_col: str, vec_col: str,
                   n_clusters: int | None = 16, threshold: float = 0.999,
                   target_cluster: int = 128,
                   max_cluster: int | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — "SemDeDup: Data-
    efficient learning at web-scale through semantic deduplication"):
    cluster the embedding space, then WITHIN each cluster drop the
    higher id of every pair whose cosine ≥ ``threshold`` — semantic
    near-duplicates that exact/MinHash text dedup cannot see.

    Scale controls (the paper scales k with n; fixed k makes the
    within-cluster pair join quadratic in the corpus):

    - ``n_clusters=None`` → k = max(16, ⌈n / target_cluster⌉), so the
      expected cluster size — and with it pairs-per-cluster — stays
      constant as the corpus grows: total pairs ≈ n·target_cluster/2,
      linear in n.
    - ``max_cluster`` (optional) is the stop-band analogue of the LSH
      band guard: a cluster larger than the cap is EXCLUDED from the
      pair join (all its members survive) — bounded work under seed
      skew, trading recall inside pathological cells only. Declared,
      not silent: the suite query and its oracle replay the same cap.

    100 TB plan shape: assignment is the two-level exact quantizer
    (:func:`seed_assignments2`, n·O(√k)·d — flat nearest-seed would be
    quadratic once k ∝ n); the pair join is scoped to a cluster
    (|cluster|² pairs instead of |corpus|²), pairs ride ONE equi-shuffle
    on the cluster id, and each pair is a single row carrying two
    fixed-point arrays (``zip_with`` dot, no pair×dimension explode).
    Everything is bit-reproducible in SQL.

    Keep-rule: drop ids that appear as the HIGHER side of any qualifying
    pair. Deterministic, and the lowest id of every CONNECTED near-dup
    group always survives — but note the rule is edge-wise, not
    group-wise greedy: in a chain a~b, b~c (a≁c), both b and c are
    dropped even though c's only qualifying partner b was itself
    dropped. SemDeDup's per-cluster intent tolerates either reading; the
    oracle replays exactly this rule.

    Emits survivors (id, cluster)."""
    if n_clusters is None:
        n = df.count()
        n_clusters = max(16, -(-n // int(target_cluster)))
    assign = cache.pin(seed_assignments2(df, id_col, vec_col, n_clusters))
    pair_assign = assign
    if max_cluster is not None:
        ok = (
            assign.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("_csz"))
            .filter(F.col("_csz") <= int(max_cluster))
            .select("cluster")
        )
        pair_assign = assign.join(F.broadcast(ok), "cluster", "left_semi")
    n2 = F.aggregate(
        F.transform(F.col("vl"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # the (id, vl, n2, cluster) relation feeds BOTH sides of the
    # within-cluster pair join — pin it so the scan + fixed-point cast +
    # assignment join run once, not once per side (broadcast conversion
    # defeats exchange reuse; the lsh_candidates lesson)
    vecs = cache.pin(
        df.select(F.col(id_col), _xl_array(vec_col).alias("vl"))
        .withColumn("n2", n2)
        .join(pair_assign, id_col)
    )
    a = vecs.select(F.col(id_col).alias("_a"), F.col("vl").alias("va"),
                    F.col("n2").alias("na2"), "cluster")
    b = vecs.select(F.col(id_col).alias("_b"), F.col("vl").alias("vb"),
                    F.col("n2").alias("nb2"), "cluster")
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    losers = (
        a.join(b, "cluster")
        .filter(F.col("_a") < F.col("_b"))
        .filter(_cosine(dot, F.col("na2"), F.col("nb2")) >= F.lit(threshold))
        .select(F.col("_b").alias(id_col))
        .distinct()
    )
    return assign.join(losers, id_col, "left_anti").select(id_col, "cluster")


def ivf_seed_topk(df: DataFrame, id_col: str, vec_col: str, query_id,
                  k: int = 10, n_clusters: int = 16, nprobe: int = 4) -> DataFrame:
    """IVF probe against SEED centroids — the fully deterministic,
    oracle-able variant of ``ivf_topk`` (assignment math documented at
    :func:`seed_assignments`). Scan economics match ivf_topk:
    candidates ≈ nprobe/n_clusters of the corpus, then exact
    fixed-point cosine top-k.

    Probe selection runs on the DRIVER in the same exact int64 math:
    query-to-centroid distances are nprobe·k·d integer ops over the
    already-collected seed vectors plus the (pushdown-filtered) query
    row — the earlier shape evaluated the full n·k distributed d2
    relation a second time just to read its k query rows."""
    from pyspark.sql import Window as W

    spark = df.sparkSession
    cents = _seed_cents(df, id_col, vec_col, n_clusters)
    qrow = (
        df.filter(F.col(id_col) == F.lit(query_id))
        .select(_xl_array(vec_col).alias("vl")).first()
    )
    if qrow is None:
        probe: list[int] = []  # no query row ⇒ no probed clusters (as before)
    else:
        qvl = [int(x) for x in qrow["vl"]]
        probe = [
            ci
            for _, ci in sorted(
                (sum((a - b) * (a - b) for a, b in zip(vl, qvl)), ci)
                for ci, vl in cents
            )[: int(nprobe)]
        ]
    cent = spark.createDataFrame(
        [(ci, j + 1, xl) for ci, vl in cents for j, xl in enumerate(vl)],
        "cluster int, j int, cl long",
    )
    elem = exploded(df, id_col, vec_col)
    d2 = (
        elem.join(F.broadcast(cent), "j")
        .groupBy(id_col, "cluster")
        .agg(F.sum((F.col("xl") - F.col("cl")) * (F.col("xl") - F.col("cl"))).alias("d2"))
    )
    assign = d2.withColumn(
        "rn", F.row_number().over(W.partitionBy(id_col).orderBy("d2", "cluster"))
    ).filter(F.col("rn") == 1).select(id_col, "cluster")
    ids = (
        assign.filter(F.col("cluster").isin(probe)).select(id_col)
        .union(df.filter(F.col(id_col) == F.lit(query_id)).select(id_col))
        .distinct()
    )
    cand = df.join(ids, id_col, "left_semi")
    return cosine_topk(cand, id_col, vec_col, query_id, k=k)


def _xl_array(vec_col: str) -> Column:
    """Whole vector in fixed-point longs (same element path as exploded())."""
    return F.transform(
        F.col(vec_col),
        lambda x: (x.cast("double").cast(_ELEM_DEC) * 100_000_000).cast("long"),
    )


def cosine_pairs(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(doc_a, doc_b, cos_sim) for pairs sharing an LSH bucket (a < b).

    Array-native verify: each candidate pair is ONE row carrying two
    fixed-point long arrays, and the dot product / norms are
    ``zip_with``+``aggregate`` over those arrays — integer-exact (index
    order, same sums as any order) and ~dims× smaller on the wire than
    the earlier (pair × dimension) explode-join, whose intermediate was
    |pairs|·dims rows through two shuffles. Candidates come from ONE
    groupBy over the bucket relation (sorted-id array, pos-explode +
    tail-slice — each unordered pair once, doc_a < doc_b by sort order):
    the earlier bucket self-join exchanged the bucket relation twice and
    needed it persisted; this shape computes it once, uncached."""
    grouped = lsh_buckets(df, id_col, vec_col).groupBy("bucket").agg(
        F.array_sort(F.collect_list(F.col(id_col))).alias("_ids")
    )
    cand = (
        grouped.select(F.posexplode("_ids").alias("_i", "doc_a"), "_ids")
        .select(
            "doc_a",
            F.explode(
                F.slice("_ids", F.col("_i") + 2, F.size("_ids") - F.col("_i") - 1)
            ).alias("doc_b"),
        )
    )
    return _exact_cosine(cand, df, id_col, vec_col)


def _exact_cosine(cand: DataFrame, df: DataFrame, id_col: str,
                  vec_col: str) -> DataFrame:
    """Attach the exact fixed-point cosine to a (doc_a, doc_b) candidate
    relation — the array-native verify shared by ``cosine_pairs`` and
    ``banded_pairs`` (one row per pair, ``zip_with``+``aggregate`` dot
    product, integer-exact in any order)."""
    n2 = F.aggregate(
        F.transform(F.col("vl"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    vecs = df.select(F.col(id_col), _xl_array(vec_col).alias("vl")).withColumn("n2", n2)
    va = vecs.select(F.col(id_col).alias("doc_a"), F.col("vl").alias("va"),
                     F.col("n2").alias("na2"))
    vb = vecs.select(F.col(id_col).alias("doc_b"), F.col("vl").alias("vb"),
                     F.col("n2").alias("nb2"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            _cosine(dot, F.col("na2"), F.col("nb2")).alias("cos_sim"),
        )
    )


def banded_pairs(df: DataFrame, id_col: str, vec_col: str,
                 band: int = 64) -> DataFrame:
    """(doc_a, doc_b, cos_sim) — the BANDED production config of the
    LSH-bucket candidate pairs: within each bucket, members are totally
    ordered by (md5(id), id) and each vector pairs only with the
    ``band`` members FOLLOWING it in that order.

    Scale contract (the ANN analog of the dedup family's ``max_bucket``
    stop-band): candidates ≤ n·band BY CONSTRUCTION — worst-case LINEAR
    in corpus size even if every vector hashes to one bucket, where the
    unbanded bucket self-join densifies as Σ|bucket|² (fixed bucket
    count ⇒ quadratic per decade; measured 6.5 s → 238 s over sf1→sf10
    on the 8-plane/256-bucket layout, BASELINE.md RESULTS-r13). The
    hash order is geometry-blind, so buckets with ≤ band+1 members pair
    EXACTLY as the research config; larger buckets trade recall for the
    linear bound — declared, and replayed identically by the oracle.

    Plan: ONE window over (bucket, hash-order) whose frame is the
    ``band`` FOLLOWING rows — ``collect_list(id) over rows between 1
    and band`` exploded gives each vector exactly its following
    band-mates, so the candidate relation falls out of a single
    bucket-keyed exchange with no position self-join at all (the
    earlier shape paid a second window pass plus a sort-merge join of
    an offset-exploded probe relation back on (bucket, position) —
    two extra exchanges and two sorts for the same pair set)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(1, int(band))
    )
    cand = (
        lsh_buckets(df, id_col, vec_col)
        # window first, generator second: explode() cannot wrap a window
        # expression inside one projection
        .withColumn("_next", F.collect_list(F.col(id_col)).over(w))
        .select(
            F.col(id_col).alias("doc_a"),
            F.explode(F.col("_next")).alias("doc_b"),
        )
    )
    return _exact_cosine(cand, df, id_col, vec_col)


def knn_join(df: DataFrame, id_col: str, vec_col: str, k: int = 5) -> DataFrame:
    """Approximate k-NN self-join: for EVERY vector, its top-``k``
    neighbors by cosine among vectors sharing its hyperplane-LSH bucket
    — the all-pairs scale path of ANN (vs ``cosine_topk``'s one-query
    form). Returns (doc_a, doc_b, rank, cos_sim), rank 1-based by
    (cos_sim desc, doc_b asc) — a deterministic total order.

    Plan: the bucketed candidate pairs + array-native exact verify come
    from ``cosine_pairs`` (one bucket-keyed shuffle, one row per pair);
    the pair relation is pinned before symmetrization so the verify work
    runs ONCE, not once per union branch (the connected_components
    lesson); the per-vector top-k is a keyed window — one shuffle on
    doc_a, no driver-side state. Vectors whose bucket holds no other
    vector yield no rows (approximate-by-design: LSH recall, not a
    correctness gap — the oracle applies the same candidate rule)."""
    return _topk_of_pairs(cache.pin(cosine_pairs(df, id_col, vec_col)), k)


def _topk_of_pairs(pairs: DataFrame, k: int) -> DataFrame:
    """Symmetrize a pinned (doc_a, doc_b, cos_sim) pair relation and keep
    each doc_a's top-``k`` by (cos_sim desc, doc_b) — the shared tail of
    the k-NN joins (one keyed window shuffle, no driver-side state)."""
    sym = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"),
            F.col("doc_a").alias("doc_b"),
            "cos_sim",
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_a").orderBy(F.col("cos_sim").desc(), F.col("doc_b"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_a", "doc_b", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def knn_join_banded(df: DataFrame, id_col: str, vec_col: str, k: int = 5,
                    band: int = 64) -> DataFrame:
    """Production config of the k-NN self-join: ``knn_join`` over the
    BANDED candidate relation (:func:`banded_pairs` — candidates ≤
    n·band by construction, worst-case linear at any corpus size or
    bucket skew). Same output contract: (doc_a, doc_b, rank, cos_sim),
    rank 1-based by (cos_sim desc, doc_b). Identical to ``knn_join``
    whenever every bucket holds ≤ band+1 vectors (small-sf gates);
    bounded-recall, declared, at densities beyond that."""
    return _topk_of_pairs(
        cache.pin(banded_pairs(df, id_col, vec_col, band=band)), k)


def pq_codes(df: DataFrame, id_col: str, vec_col: str,
             m: int = 4, ksub: int = 16):
    """Product-quantization encoder with seeded codebooks.

    The vector space splits into ``m`` contiguous subspaces; each
    subspace's codebook is the corresponding slice of the ``ksub``
    lowest-id vectors (seed codewords — the deterministic, oracle-able
    choice, mirroring ``ivf_seed_topk``'s seed centroids). Every vector
    is encoded as ``m`` one-byte codes: the nearest codeword per
    subspace by **exact int64 fixed-point squared L2** (headroom:
    (xl−cl)² ≤ 4·10¹⁶, × dsub dims ≤ 2⁶³ for dsub ≤ 230), id-ordered
    tie-break on the code index.

    Storage story at 100 TB: a 64-dim float vector (256 B) compresses to
    m=4 bytes + id — the classic 64× memory cut that makes billion-scale
    ANN fit executor memory. Plan: the codebook is dim×ksub rows —
    broadcast; encoding is one map-side join + one partial-aggregable
    groupBy + one keyed argmin window on (id, subspace).

    Returns (codes DataFrame [id, s, code], codebook DataFrame
    [s, code, j, cl]).
    """
    from pyspark.sql.window import Window as W

    # the ksub seed codewords come back to the driver (ksub·d longs,
    # bounded) and the codebook is a LITERAL relation: the earlier shape
    # derived it from a second full scan → explode → join of the corpus
    # (and a separate first() just for the dimensionality)
    seeds = _seed_cents(df, id_col, vec_col, ksub)
    if not seeds:
        raise ValueError("pq_codes: empty input relation")
    dim = len(seeds[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    elem = exploded(df, id_col, vec_col)
    codebook = df.sparkSession.createDataFrame(
        [(j // dsub, code, j + 1, xl)
         for code, vl in seeds for j, xl in enumerate(vl)],
        "s int, code int, j int, cl long",
    )
    d2 = (
        elem.join(F.broadcast(codebook), "j")
        .groupBy(id_col, "s", "code")
        .agg(F.sum((F.col("xl") - F.col("cl")) * (F.col("xl") - F.col("cl"))).alias("d2"))
    )
    codes = (
        d2.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy(id_col, "s").orderBy("d2", "code")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(id_col, "s", "code")
    )
    return codes, codebook


def pq_topk(df: DataFrame, id_col: str, vec_col: str, query_id,
            k: int = 10, m: int = 4, ksub: int = 16) -> DataFrame:
    """ANN top-k by asymmetric distance computation (ADC) over PQ codes:
    the query stays exact while the corpus is represented by its ``m``
    codes, so each candidate's approximate squared L2 is Σ_s
    lut[s, code_s] — ``m`` integer adds per vector against a
    broadcast m×ksub lookup table. The scan never touches the original
    vectors (that is the point: at 100 TB the float vectors stay in cold
    storage; the code table is ~1/64 the bytes and the LUT is constant-
    size). Exact int64 arithmetic end to end — bit-portable. Ties break
    by id; the query vector itself is excluded.

    Returns (id, d2_fp) — fixed-point squared L2 (scale 10¹⁶), ascending.
    """
    codes, codebook = pq_codes(df, id_col, vec_col, m=m, ksub=ksub)
    # the ADC lookup table is m×ksub cells over the (already driver-side)
    # codebook and the one query vector — computed on the driver in the
    # same exact int64 math and broadcast as a literal; the earlier shape
    # spent a scan (query explode) + join + aggregation on it
    qrow = (
        df.filter(F.col(id_col) == F.lit(query_id))
        .select(_xl_array(vec_col).alias("vl")).first()
    )
    lut_cells: dict[tuple, int] = {}
    if qrow is not None:
        ql = [int(x) for x in qrow["vl"]]
        for r in codebook.collect():  # ksub·dim literal rows, no Spark job
            key = (r["s"], r["code"])
            d = ql[r["j"] - 1] - r["cl"]
            lut_cells[key] = lut_cells.get(key, 0) + d * d
    lut = df.sparkSession.createDataFrame(
        [(s, c, qd2) for (s, c), qd2 in sorted(lut_cells.items())],
        "s int, code int, qd2 long",
    )
    return (
        codes.filter(F.col(id_col) != F.lit(query_id))
        .join(F.broadcast(lut), ["s", "code"])
        .groupBy(id_col)
        .agg(F.sum("qd2").cast("long").alias("d2_fp"))
        .orderBy(F.col("d2_fp").asc(), F.col(id_col))
        .limit(k)
    )


def pq_topk_rerank(df: DataFrame, id_col: str, vec_col: str, query_id,
                   k: int = 10, shortlist: int = 50,
                   m: int = 4, ksub: int = 16) -> DataFrame:
    """Two-stage ANN: PQ/ADC shortlist, exact re-rank — the production
    recipe (FAISS IVF-PQ + refine). Stage 1 scans only the code table
    (``pq_topk``'s plan: m integer adds per vector against a broadcast
    LUT) and keeps the ``shortlist`` best approximate candidates; stage
    2 loads the ORIGINAL vectors for just those candidates (a
    shortlist-sized semi join — the only touch of the float data) and
    scores exact fixed-point cosine. Recall is bounded by the shortlist
    (ties broken by id at both stages, so the cut is deterministic and
    oracle-able); cost stays ~code-table scan + |shortlist| exact
    distances no matter the corpus size.

    Returns (id, cos_sim) — exact cosines of the re-ranked top ``k``.
    """
    short = pq_topk(df, id_col, vec_col, query_id,
                    k=shortlist, m=m, ksub=ksub).select(id_col)
    cand = df.join(short, id_col, "left_semi").unionByName(
        df.filter(F.col(id_col) == F.lit(query_id))
    ).distinct()
    return cosine_topk(cand, id_col, vec_col, query_id, k=k)


def kmeans_assignments(df: DataFrame, id_col: str, vec_col: str,
                       k: int = 8, iters: int = 2) -> DataFrame:
    """Grid-quantized Lloyd's k-means, fully deterministic and fully
    distributed — the first-class iterative-ML demo (the IVF coarse
    quantizer's big sibling; semantic_dedup's two-level quantizer is
    the k ∝ n scale rung, this is the classic fixed-k loop).

    Exactness design: assignment distances are int64 fixed-point
    squared L2 on the 10⁻⁸ element grid (exact, order-proof, ALU
    speed); the centroid UPDATE re-quantizes each per-dimension mean
    back onto the same grid with integer round-half-away-from-zero
    ((|s| + n div 2) div n on nonnegative operands — identical in any
    engine, no float division anywhere). Grid-quantized means keep
    every subsequent iteration exact, so cluster membership after T
    iterations is bit-reproducible cross-engine — the property the
    DuckDB oracle (unrolled CTE per iteration) checks. Ties break on
    the lower cluster index; empty clusters keep their previous
    centroid.

    Plan shape (100 TB): the centroid relation is k×d rows and rides a
    BROADCAST join into the element stream; one assignment = that join
    + a (id, cluster)-keyed aggregation + a per-id argmin window; one
    update = an id-keyed join back + a (cluster, j)-keyed aggregation.
    No driver-side math in the loop (only the k seed ids are pulled);
    cost is n·k·d per iteration — for k ∝ corpus use the two-level
    quantizer (:func:`seed_assignments2`) instead.

    Returns (id, cluster int, d2 long) — the final assignment and its
    exact fixed-point distance.
    """
    from pyspark.sql.window import Window as W

    spark = df.sparkSession
    elem = cache.pin(exploded(df, id_col, vec_col))
    # centroid state lives on the DRIVER as k·d longs (bounded): each
    # update pulls the (cluster, j, Σxl, n) sums — k·d rows — and applies
    # the SAME integer round-half-away-from-zero formula in exact Python
    # int math, then re-broadcasts a literal relation. The earlier shape
    # kept centroids distributed: every iteration pinned a new k·d-row
    # relation whose lineage chained through the previous assignment, so
    # the final plan nested T iterations of joins/windows and re-ran the
    # assignment once per reference (jobs 30 → 6 at sf0.1, iters=2).
    cent_state = {
        (ci, j + 1): xl
        for ci, vl in _seed_cents(df, id_col, vec_col, k)
        for j, xl in enumerate(vl)
    }

    def _cent_df() -> DataFrame:
        return spark.createDataFrame(
            [(ci, j, xl) for (ci, j), xl in sorted(cent_state.items())],
            "cluster int, j int, cl long",
        )

    def assign(c: DataFrame) -> DataFrame:
        d2 = (
            elem.join(F.broadcast(c), "j")
            .groupBy(id_col, "cluster")
            .agg(F.sum((F.col("xl") - F.col("cl"))
                       * (F.col("xl") - F.col("cl"))).alias("d2"))
        )
        return (
            d2.withColumn(
                "_rn",
                F.row_number().over(W.partitionBy(id_col).orderBy("d2", "cluster")),
            )
            .filter(F.col("_rn") == 1)
            .select(F.col(id_col), F.col("cluster"),
                    F.col("d2").cast("long").alias("d2"))
        )

    for _ in range(iters):
        a = assign(_cent_df())
        sums = (
            a.select(id_col, "cluster").join(elem, id_col)
            .groupBy("cluster", "j")
            .agg(F.sum("xl").alias("s"), F.count("*").cast("long").alias("n"))
        ).collect()  # k·d rows, bounded
        for r in sums:
            s, n = int(r["s"]), int(r["n"])
            # integer round-half-away-from-zero mean, identical to the
            # previous in-plan `(s + (n div 2)) div n` on nonnegative
            # operands (empty clusters keep their previous centroid by
            # simply not appearing in `sums`)
            cent_state[(r["cluster"], r["j"])] = (
                (s + n // 2) // n if s >= 0 else -((-s + n // 2) // n)
            )
    return assign(_cent_df())


def sq8_codes(df: DataFrame, id_col: str, vec_col: str):
    """SQ8 scalar quantization: each vector element compressed to ONE
    byte against per-dimension [min, max] trained on the corpus — the
    4-8× memory lever under every large ANN deployment (FAISS
    ScalarQuantizer). All integer fixed-point, so codes and
    reconstructions are bit-identical in any engine:

    - train: per-dimension min/max over the element relation (one
      map-side-combinable aggregation; the params relation is dim-sized);
    - encode: c = ((xl − mn)·255) div (mx − mn), clamped degenerate
      dims (mx == mn) to 0 — integer division, no float rounding;
    - reconstruct: r = mn + (c·(mx − mn)) div 255 (the decoder any
      reader applies; |xl − r| ≤ (mx−mn)/255 + 1 micro-units).

    Returns (codes, params): codes = (id, j, code, rl) with the
    reconstruction alongside; params = (j, mn, mx). Plan shape: one
    aggregation + one broadcast join of the dim-sized params."""
    elem = exploded(df, id_col, vec_col)
    params = elem.groupBy("j").agg(
        F.min("xl").alias("mn"), F.max("xl").alias("mx")
    )
    joined = elem.join(F.broadcast(params), "j")
    code = F.when(
        F.col("mx") == F.col("mn"), F.lit(0)
    ).otherwise(
        F.expr("((xl - mn) * 255) div (mx - mn)")
    ).cast("int")
    codes = joined.select(
        id_col, "j", code.alias("code"), "mn", "mx",
    ).select(
        id_col, "j", "code",
        (F.col("mn") + F.expr("(code * (mx - mn)) div 255"))
        .cast("long").alias("rl"),
    )
    return codes, params


def sq8_topk(df: DataFrame, id_col: str, vec_col: str, query_id,
             k: int = 10) -> DataFrame:
    """ANN top-k by SQ8 asymmetric distance (ADC): the EXACT query
    vector scored against every corpus vector's one-byte-per-dim
    reconstruction — Σ (q − r)² in int64 (unit-norm headroom:
    diff ≤ 2·10⁸, squared ≤ 4·10¹⁶, ×64 dims < 2⁶³). Ties break by id;
    output (vec_id, adc_d2) ascending. One aggregation + one broadcast
    of the dim-sized query relation — vectors never leave their
    partitions, codes are what a production index would hold in RAM."""
    codes, _ = sq8_codes(df, id_col, vec_col)
    q = (
        exploded(df.filter(F.col(id_col) == F.lit(query_id)), id_col, vec_col)
        .select("j", F.col("xl").alias("ql"))
    )
    d2 = (
        codes.filter(F.col(id_col) != F.lit(query_id))
        .join(F.broadcast(q), "j")
        .groupBy(id_col)
        .agg(F.sum((F.col("ql") - F.col("rl")) * (F.col("ql") - F.col("rl")))
             .alias("adc_d2"))
    )
    return d2.orderBy("adc_d2", id_col).limit(k)
