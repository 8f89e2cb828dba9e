"""Randomized differentials for the round-9 operators: DSIR weights and
length buckets replayed by pure-python references on random corpora.
Spark collects once per case; the python replay recomputes from the raw
rows with exact Fraction/decimal arithmetic where the operator pins
decimals — any hash-bucket, smoothing, ntile or waste-math divergence
fails loudly."""

import hashlib
import math
from decimal import Decimal, ROUND_HALF_EVEN
from fractions import Fraction

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from reactivedb_spark.operators.importance import dsir_log_weights
from reactivedb_spark.operators.packing import length_buckets

VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]

_doc = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12)
_corpus = st.lists(
    st.tuples(_doc, st.booleans()), min_size=1, max_size=10)


def _bucket(w: str, b: int) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % b


def _dsir_replay(rows, b):
    toks = [(i, t, _bucket(w, b))
            for i, (words, t) in enumerate(rows) for w in words]
    n_s = len(toks)
    n_t = sum(1 for _, t, _ in toks if t)
    c_s, c_t = {}, {}
    for _, t, bk in toks:
        c_s[bk] = c_s.get(bk, 0) + 1
        if t:
            c_t[bk] = c_t.get(bk, 0) + 1
    out = {}
    for i, (words, _) in enumerate(rows):
        if not words:
            continue
        cnts = {}
        for w in words:
            bk = _bucket(w, b)
            cnts[bk] = cnts.get(bk, 0) + 1
        total = Decimal(0)
        for bk, cnt in cnts.items():
            # same IEEE op order as both engines
            arg = ((c_t.get(bk, 0) + 1) / (n_t + b)) / ((c_s[bk] + 1) / (n_s + b))
            # pin to 14 decimal places like both engines' DECIMAL(28,14)
            # cast; rounding-mode differences on the 15th digit are
            # absorbed by the final round(6) + the approx tolerance
            lnr = Decimal(math.log(arg)).quantize(
                Decimal("1E-14"), rounding=ROUND_HALF_EVEN)
            total += Decimal(cnt) * lnr
        out[i] = (len(words), float(round(float(total), 6)))
    return out


@pytest.mark.usefixtures("spark")
@given(_corpus, st.sampled_from([8, 64]))
@settings(max_examples=12, deadline=None)
def test_dsir_matches_python_replay(spark, corpus, b):
    rows = [(i, " ".join(words), t) for i, (words, t) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {r.doc_id: (r.n_tokens, r.log_w) for r in
           dsir_log_weights(df, "doc_id", "text", F.col("is_t"),
                            n_buckets=b).collect()}
    want = _dsir_replay(corpus, b)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], f"doc {i} token count"
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6), \
            f"doc {i}: {got[i][1]} vs {want[i][1]}"


_lb_corpus = st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.integers(min_value=0, max_value=9)),
    min_size=1, max_size=16)


def _lb_replay(rows, k):
    by = {}
    for i, (src, n) in enumerate(rows):
        by.setdefault(src, []).append((n, i))
    out = {}
    for src, docs in by.items():
        docs.sort()
        n = len(docs)
        # SQL ntile: first (n % k) buckets get ceil(n/k), rest floor
        sizes = [(n // k) + (1 if j < n % k else 0) for j in range(k)]
        pos = 0
        for j, sz in enumerate(sizes, start=1):
            if sz == 0:
                continue
            grp = docs[pos:pos + sz]
            pos += sz
            tot = sum(g[0] for g in grp)
            mx = max(g[0] for g in grp)
            waste = 0 if mx * sz == 0 else (mx * sz - tot) * 1_000_000 // (mx * sz)
            out[(src, j)] = (sz, tot, mx, waste)
    return out


@pytest.mark.usefixtures("spark")
@given(_lb_corpus, st.sampled_from([2, 3, 5]))
@settings(max_examples=12, deadline=None)
def test_length_buckets_matches_python_replay(spark, corpus, k):
    rows = [(i, src, " ".join(["w"] * n)) for i, (src, n) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    got = {(r.stratum, r.bucket): (r.n_docs, r.total_tokens, r.max_tokens,
                                   r.waste_ppm)
           for r in length_buckets(df, "doc_id", "src", "text", k=k).collect()}
    assert got == _lb_replay(corpus, k)


def _resample_replay(rows, b, budget):
    """Exact replay of dsir_resample's selection: log_w from the dsir
    replay, the md5-uniform Gumbel draw, round-6 key, (key DESC, id)
    top-k."""
    w = _dsir_replay(rows, b)
    keyed = []
    for i, (n_tok, log_w) in w.items():
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        u = h / float(1 << 60)
        key = round(log_w + -math.log(-math.log(u)), 6)
        keyed.append((-key, i))
    keyed.sort()
    sel = {i for _, i in keyed[:budget]}
    # margin between the last selected and first rejected key: the
    # python replay's ln pin tolerates ~2e-6 vs the engines (see
    # test_dsir_matches_python_replay), so a boundary tighter than that
    # is not a meaningful differential case
    margin = (keyed[budget][0] - keyed[budget - 1][0]
              if len(keyed) > budget else float("inf"))
    return sel, margin


@pytest.mark.usefixtures("spark")
@given(_corpus, st.sampled_from([8, 64]), st.integers(min_value=1, max_value=6))
@settings(max_examples=10, deadline=None)
def test_dsir_resample_matches_python_replay(spark, corpus, b, budget):
    """The round-10 consumer: Gumbel-top-k selection must pick the exact
    same document SET as the pure-python replay (selection is a set
    comparison, so a key drift at the k-th boundary fails loudly —
    the risk the round-6 double pin was chosen to kill)."""
    from reactivedb_spark.operators.importance import dsir_resample

    from hypothesis import assume

    rows = [(i, " ".join(words), t) for i, (words, t) in enumerate(corpus)]
    want, margin = _resample_replay(corpus, b, budget)
    assume(margin > 1e-5)  # skip replay-tolerance-tight boundaries
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {r.doc_id for r in dsir_resample(
        df, "doc_id", "text", F.col("is_t"),
        budget=budget, n_buckets=b).collect()}
    assert got == want
