#!/usr/bin/env python
"""Scale-model fixture builder (VERDICT r4 #8): replicate an existing
testdata sf dir by an integer factor with key shifts and content
mutation, producing e.g. an sf1 (6M-lineitem) dir from sf0.1 WITHOUT
touching /root/testdata (output goes to a scratch dir).

Replication model — each copy is an independent shard of the same
distribution, which is the honest way to scale load one order of
magnitude:
- fact keys shift per copy (orderkey/custkey/doc_id/vec_id/event_id/
  user_id), so joins and groupings see 10× keys, not 10× duplicates;
- dimension tables (region/nation/supplier/part) stay fixed, like real
  warehouses;
- document TEXT gets a per-copy alphabet rotation (a-z mapped rot-i),
  so BOTH word-level and character-n-gram similarity across copies is
  zero while every within-copy property (token counts, lengths, dup
  families, n_chars) is preserved exactly — the near-dup structure
  scales linearly (clusters ×K, LSH pairs ×K) instead of
  quadratically. (A first attempt salted tokens with a ``~i`` suffix;
  that left char shingles ~80% shared across copies and blew
  n-gram-LSH candidates up ×100 — itself a useful boilerplate
  case-study, but the wrong default scale model);
- embeddings rotate their components by the copy index, so cross-copy
  cosine is uncorrelated and ANN sees a 10× corpus, not 10 mirrors.

Pure pyarrow/pandas so physical parquet types (TIMESTAMP(NANOS) in
events) survive byte-exact.

Usage: python scripts/make_sf_scale.py [--src /root/testdata/sf0.1]
       [--dst /tmp/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIMS = ("region", "nation", "supplier", "part")
# columns grouped by KEY DOMAIN: every column referencing the same
# entity must shift by the same base (derived from the max across the
# whole domain, primary key included) or cross-copy joins silently
# break — e.g. if max(o_custkey) and max(c_custkey) straddle a power of
# 10, per-column bases would shift orders and customers differently and
# every scaled copy's orders would reference nonexistent customers.
KEY_DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
SHIFT_COLS = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def _domain_bases(src: str) -> dict[str, int]:
    bases = {}
    for domain, cols in KEY_DOMAINS.items():
        m = 0
        for table, col in cols:
            path = os.path.join(src, f"{table}.parquet")
            if not os.path.exists(path):
                continue
            t = pq.read_table(path, columns=[col])
            m = max(m, int(pc.max(t.column(col)).as_py() or 0))
        # next power of 10 above the domain max keeps shifted ids readable
        base = 10
        while base <= m:
            base *= 10
        bases[domain] = base
    return bases


# Per-copy letter substitution = AFFINE cipher x → (a·x + b) mod 26.
# Round-7 upgrade (the plain rotation has period 26, and CHAINING
# sf1→sf10 composes rotations into (i+j) mod 26 — copies with equal
# totals are word-IDENTICAL shards, re-creating the quadratic cross-copy
# blowup): with a drawn from the 12 residues coprime to 26 and b from
# 0..25, there are 312 distinct substitutions, and any two DISTINCT
# affine maps agree on at most gcd(a_i−a_j, 26) = 2 letters (a's are all
# odd, so the difference is even and never 0 mod 26 unless equal; equal
# a with different b agree nowhere). Hence no 3-gram of ≥2 distinct
# letters survives across copies — cross-copy word AND char-n-gram
# similarity stays ~0 for factors up to 312.
_AFFINE_A = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def _salt_text(arr: pa.ChunkedArray, i: int) -> pa.Array:
    import string

    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    digits = string.digits
    a = _AFFINE_A[(i // 26) % len(_AFFINE_A)]
    b = i % 26
    sub_l = "".join(lower[(a * x + b) % 26] for x in range(26))
    sub_u = "".join(upper[(a * x + b) % 26] for x in range(26))
    table = str.maketrans(
        lower + upper + digits,
        sub_l + sub_u + digits[i % 10:] + digits[:i % 10],
    )
    return pa.array(
        [None if t is None else t.translate(table) for t in arr.to_pylist()],
        type=arr.type,
    )


def _rotate_lists(arr: pa.ChunkedArray, i: int) -> pa.Array:
    # component rotation (period = dims) composed with a full sign flip
    # on the second lap (period 2·dims = 128 for the 64-dim fixtures):
    # same-rotation copies on different laps have cosine −1 — maximally
    # DISsimilar, so ANN/dedup never sees cross-copy mirrors.
    pylist = arr.to_pylist()
    out = []
    for v in pylist:
        if v is None or len(v) == 0:
            out.append(v)
            continue
        k = i % len(v)
        flip = (i // len(v)) % 2
        r = v[k:] + v[:k] if k else list(v)
        out.append([-x for x in r] if flip else r)
    return pa.array(out, type=arr.type)


def scale_table(src: str, dst: str, table: str, factor: int,
                domain_bases: dict[str, int]) -> int:
    t = pq.read_table(os.path.join(src, f"{table}.parquet"))
    if table in DIMS or factor == 1:
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return t.num_rows
    bases = {
        c: domain_bases[d] for c, d in SHIFT_COLS.get(table, {}).items()
    }
    copies = []
    for i in range(factor):
        c = t
        for col, base in bases.items():
            idx = c.schema.get_field_index(col)
            shifted = pc.add(c.column(col), pa.scalar(i * base, type=c.schema.field(col).type))
            c = c.set_column(idx, c.schema.field(col), shifted)
        if table == "documents" and i > 0:
            idx = c.schema.get_field_index("text")
            salted = _salt_text(c.column("text"), i)
            c = c.set_column(idx, c.schema.field("text"), salted)
            if "n_chars" in c.schema.names:
                ncid = c.schema.get_field_index("n_chars")
                nc = pc.cast(pc.utf8_length(c.column("text")), c.schema.field("n_chars").type)
                c = c.set_column(ncid, c.schema.field("n_chars"), nc)
        if table == "embeddings" and i > 0:
            idx = c.schema.get_field_index("embedding")
            c = c.set_column(idx, c.schema.field("embedding"),
                             _rotate_lists(c.column("embedding"), i))
        if table == "customer" and i > 0:
            # c_name is derived from c_custkey in the base fixtures
            # ('Customer#%09d'); leaving it unshifted makes every copy a
            # byte-identical name set — 10 exact duplicates per name —
            # which re-creates the quadratic cross-copy blowup for any
            # string-similarity operator (fuzzy join candidates ×K²,
            # ed-0 pairs ×C(K,2)). Regenerate the name from the SHIFTED
            # key so the derivation invariant survives scaling.
            idx = c.schema.get_field_index("c_name")
            names = pa.array(
                ["Customer#%09d" % k for k in c.column("c_custkey").to_pylist()],
                type=c.schema.field("c_name").type,
            )
            c = c.set_column(idx, c.schema.field("c_name"), names)
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(dst, f"{table}.parquet"))
    return out.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    # the affine letter substitution in _salt_text has period 312
    # (12 multipliers × 26 offsets); copy 312 would be a byte-identical
    # text clone of copy 0, silently reintroducing the quadratic
    # cross-copy near-dup blowup the substitution exists to prevent.
    # NOTE: do NOT chain runs (e.g. sf1 → sf10) — composing per-copy
    # substitutions collides (rotation i then j lands at i+j, so shards
    # with equal totals are word-identical); always scale from the
    # ORIGINAL fixtures with the full factor.
    if args.factor > 312:
        raise SystemExit(
            "--factor > 312 exceeds the affine-substitution period: copy "
            "312 would clone copy 0's text byte-for-byte (see _salt_text)"
        )
    if args.factor > 128:
        print(
            "WARNING: --factor > 128 exceeds the embedding "
            "rotation+sign-flip period (2×64 dims); copies i and i+128 "
            "re-correlate in cosine"
        )
    if args.factor > 10:
        print(
            "WARNING: --factor > 10 exceeds the digit-rotation period; "
            "digit-only tokens re-correlate across copies i and i+10"
        )
    os.makedirs(args.dst, exist_ok=True)
    tables = sorted(
        re.sub(r"\.parquet$", "", f)
        for f in os.listdir(args.src)
        if f.endswith(".parquet")
    )
    bases = _domain_bases(args.src)
    for table in tables:
        n = scale_table(args.src, args.dst, table, args.factor, bases)
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
