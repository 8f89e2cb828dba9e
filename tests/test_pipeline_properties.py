"""Differential property tests for the round-4 pipeline operators:
seeded random datasets evaluated by the Spark operator AND by an
independent pure-Python reference implementation of the declared
contract. Datasets are batched into ONE DataFrame per operator (a
dataset-id key) so each test costs a single Spark job, following the
test_dsl_properties.py convention."""

from __future__ import annotations

import random
from collections import defaultdict

from reactivedb_spark.operators import dedup, numeric, timeseries


# ---------------------------------------------------------------------------
# rolling: trailing-n frames vs a pure-Python walk
# ---------------------------------------------------------------------------

def test_rolling_matches_reference_walk(spark):
    rng = random.Random(411)
    rows = []
    for ds in range(6):
        for key in range(rng.randint(1, 3)):
            for i in range(rng.randint(1, 25)):
                rows.append((f"d{ds}_k{key}", i, round(rng.uniform(-50, 50), 2)))
    df = spark.createDataFrame(rows, "k string, id long, v double")
    n = 4
    got = {
        (r["k"], r["id"]): r
        for r in timeseries.rolling(df, "k", ["id"], "v", n=n).collect()
    }
    bykey = defaultdict(list)
    for k, i, v in rows:
        bykey[k].append((i, v))
    for k, seq in bykey.items():
        seq.sort()
        for pos, (i, v) in enumerate(seq):
            frame = [x for _, x in seq[max(0, pos - n + 1): pos + 1]]
            r = got[(k, i)]
            assert r["roll_n"] == len(frame)
            # exact decimal accumulation of 2-decimal values
            assert abs(r["roll_sum"] - round(sum(frame), 2)) < 1e-9, (k, i)
            assert r["roll_min"] == min(frame) and r["roll_max"] == max(frame)
            assert abs(r["roll_avg"] - r["roll_sum"] / len(frame)) < 1e-12


# ---------------------------------------------------------------------------
# resample: bucket pick + gap fill vs a pure-Python reference
# ---------------------------------------------------------------------------

def test_resample_matches_reference(spark):
    rng = random.Random(412)
    rows = []
    rid = 0
    for ds in range(5):
        for key in range(rng.randint(1, 3)):
            for _ in range(rng.randint(1, 20)):
                rid += 1
                rows.append(
                    (f"d{ds}_k{key}", rng.randint(0, 199), rid,
                     round(rng.uniform(0, 100), 2))
                )
    df = spark.createDataFrame(rows, "k string, t long, id long, v double")
    interval = 25
    got = {
        (r["key"], r["bucket"]): (r["value"], r["filled"])
        for r in timeseries.resample(df, "k", "t", "v", "id", interval).collect()
    }
    bykey = defaultdict(dict)
    for k, t, i, v in rows:
        b = t // interval
        cur = bykey[k].get(b)
        if cur is None or (t, i) > cur[0]:
            bykey[k][b] = ((t, i), v)
    expected_rows = 0
    for k, buckets in bykey.items():
        lo, hi = min(buckets), max(buckets)
        last = None
        for b in range(lo, hi + 1):
            expected_rows += 1
            if b in buckets:
                last = buckets[b][1]
                assert got[(k, b)] == (last, False), (k, b)
            else:
                assert got[(k, b)] == (last, True), (k, b)
    assert len(got) == expected_rows


# ---------------------------------------------------------------------------
# span_dedup: full differential vs a dict-based reference
# ---------------------------------------------------------------------------

def _span_dedup_reference(docs: dict[int, str], n: int):
    words = {d: t.split(" ") for d, t in docs.items()}
    owners = defaultdict(set)
    for d, w in words.items():
        for p in range(len(w) - n + 1):
            owners[" ".join(w[p:p + n])].add(d)
    keep = {s: min(ds) for s, ds in owners.items() if len(ds) >= 2}
    out = {}
    for d, w in words.items():
        covered = set()
        for p in range(len(w) - n + 1):
            s = " ".join(w[p:p + n])
            if s in keep and keep[s] != d:
                covered.update(range(p, p + n))
        kept = [tok for i, tok in enumerate(w) if i not in covered]
        out[d] = (" ".join(kept), len(w), len(covered))
    return out


def test_span_dedup_matches_reference(spark):
    rng = random.Random(413)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → dense dup spans
    docs = {}
    for d in range(40):
        length = rng.randint(1, 30)
        docs[d] = " ".join(rng.choice(vocab) for _ in range(length))
    n = 4
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in dedup.span_dedup(df, "doc_id", "text", n=n).collect()
    }
    ref = _span_dedup_reference(docs, n)
    assert got == ref


# ---------------------------------------------------------------------------
# sigma_outliers: exact integer reference
# ---------------------------------------------------------------------------

def test_sigma_outliers_matches_reference(spark):
    rng = random.Random(414)
    rows = []
    for g in range(8):
        base = rng.uniform(-100, 100)
        for _ in range(rng.randint(2, 60)):
            v = base + rng.gauss(0, 10)
            if rng.random() < 0.1:
                v += rng.choice([-1, 1]) * rng.uniform(200, 500)
            rows.append((f"g{g}", round(v, 2)))
    df = spark.createDataFrame(rows, "g string, v double")
    k = 3
    got = {r["g"]: r for r in
           numeric.sigma_outliers(df, "g", "v", k_sigma=k, scale=100).collect()}
    bykey = defaultdict(list)
    for g, v in rows:
        bykey[g].append(round(v * 100))  # same fixed-point entry
    for g, xs in bykey.items():
        nn, s, ssq = len(xs), sum(xs), sum(x * x for x in xs)
        n_out = sum(1 for x in xs if (nn * x - s) ** 2 > k * k * (nn * ssq - s * s))
        assert got[g]["n"] == nn
        assert got[g]["n_outliers"] == n_out, g
        assert abs(got[g]["mean"] - s / nn / 100.0) < 1e-9


# ---------------------------------------------------------------------------
# winsorize: reference via the same rank/ntile contract
# ---------------------------------------------------------------------------

def test_winsorize_matches_reference(spark):
    rng = random.Random(415)
    rows = []
    for g in range(4):
        for i in range(rng.randint(21, 80)):
            rows.append((f"g{g}", round(rng.uniform(-1000, 1000), 2), i))
    df = spark.createDataFrame(rows, "g string, v double, id long")
    ntiles = 20
    got = {r["g"]: r for r in
           numeric.winsorize_sum(df, "g", "v", "id", ntiles=ntiles).collect()}

    bykey = defaultdict(list)
    for g, v, i in rows:
        bykey[g].append((v, i))
    for g, vals in bykey.items():
        vals.sort()
        cnt = len(vals)
        # SQL ntile: first (cnt % ntiles) tiles get ceil(cnt/ntiles)
        big, rem = divmod(cnt, ntiles)
        tile1_size = big + (1 if rem >= 1 else 0)
        lo_cut = vals[tile1_size - 1][0]
        lastn = big + (1 if ntiles <= rem else 0)
        hi_cut = vals[cnt - lastn][0]
        wsum = sum(min(max(v, lo_cut), hi_cut) for v, _ in vals)
        assert got[g]["n"] == cnt
        assert abs(got[g]["sum_winsor"] - round(wsum, 2)) < 1e-6, g
