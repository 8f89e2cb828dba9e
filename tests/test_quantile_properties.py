"""Randomized differential for the histogram quantile sketch: a pure-
python replay of the EXACT binning/interpolation algebra on random
multi-group corpora (duplicates, negatives, constant groups, singleton
groups), plus the accuracy envelope vs true order statistics. Any
divergence in the bin rule, cumulative pick, or interpolation — the
things the DuckDB oracle also replays — fails loudly."""

import math

from hypothesis import given, settings, strategies as st

from reactivedb_spark.operators.quantile import HIST_BINS, approx_quantiles

_vals = st.lists(
    st.one_of(
        st.integers(min_value=-1000, max_value=1000).map(float),
        st.sampled_from([0.0, -1.5, 2.25, 7.0]),
    ),
    min_size=1, max_size=40,
)
_corpus = st.lists(_vals, min_size=1, max_size=3)  # one list per group
_qs = st.lists(
    st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.99, 1.0]),
    min_size=1, max_size=3, unique=True,
)


def _replay(vals, q, bins=HIST_BINS):
    """The operator's algebra in plain python doubles — NOT a smarter
    quantile; the point is bit-level agreement with the Spark plan."""
    vmin, vmax, n = min(vals), max(vals), len(vals)
    w = (vmax - vmin) / float(bins)
    hist = {}
    for v in vals:
        b = 0 if vmax == vmin else min(int(math.floor((v - vmin) / w)), bins - 1)
        hist[b] = hist.get(b, 0) + 1
    target = q * float(n)
    cum = 0
    for b in sorted(hist):
        before, cum = cum, cum + hist[b]
        if float(cum) >= target:
            if w == 0.0:
                return vmin
            return vmin + w * float(b) + w * (target - float(before)) / float(hist[b])
    raise AssertionError("unreachable: q <= 1 always lands in a bin")


@settings(max_examples=25, deadline=None)
@given(corpus=_corpus, qs=_qs)
def test_sketch_matches_python_replay_bitwise(spark, corpus, qs):
    rows = [(g, v) for g, vals in enumerate(corpus) for v in vals]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {(r["g"], r["q"]): r["est"]
           for r in approx_quantiles(df, ["g"], "v", qs).collect()}
    assert set(got) == {(g, q) for g in range(len(corpus)) for q in qs}
    for g, vals in enumerate(corpus):
        for q in qs:
            want = _replay(vals, q)
            assert got[(g, q)] == want, (g, q, vals)
            # accuracy envelope: within one bin width of the true
            # order statistic at ceil(q*n)
            exact = sorted(vals)[max(0, math.ceil(q * len(vals)) - 1)]
            w = (max(vals) - min(vals)) / HIST_BINS
            assert abs(got[(g, q)] - exact) <= w + 1e-9
