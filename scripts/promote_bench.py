#!/usr/bin/env python
"""Promote load-gated per-query medians from dated raw bench records
into BENCH_FULL.json (VERDICT r7 #3: bench.py writes only
``BENCH_RAW_<utc>.json``; the committed record changes ONLY through
this explicit step, so a driver run under a load window can never
overwrite the calm medians in place).

Usage::

    python scripts/promote_bench.py [--gate LOAD1] [RAW.json ...]

With no files given, only ``BENCH_RAW_*.json`` records with a run stamp
NEWER than the latest raw the previous promotion used are considered
(``--all`` lifts the bound, ``--last N`` keeps just the N most recent) —
.bench_evidence/ is gitignored, so an unbounded default would let stale
raw runs from before a code change keep feeding the medians
indefinitely (ADVICE r9). After each successful promotion the evidence
dir is pruned to the retention rule (sessions cited anywhere in the
committed records — BENCH_FULL.json including gated-out provenance,
plus BASELINE.md prose citations (ADVICE r11 #2) — + the
``KEEP_LAST_SESSIONS`` most recent — VERDICT r10 #7);
``--prune-only`` runs just that step, ``--no-prune`` skips it. Scale-leg raws at a different sf
and solo subset/quick raws are additionally guarded out of committed
in-suite medians (see inline notes). Gating is RUN-level: the per-query ``load1`` column is
recorded at query end, so it includes the bench's OWN 32-core work
(even a run started on an idle host reads 5-10 mid-suite) — a per-query
threshold would gate out everything. A run QUALIFIES when the minimum
load1 across its rows (≈ the ambient level during the ramp-up queries)
is <= the gate (default 5.0); runs started inside an ambient-load
window carry a floor well above it. Per query, the median across
qualifying runs is promoted; queries with NO qualifying sample keep
their current BENCH_FULL.json value (promotion never degrades the
record to a known load artifact). The output carries provenance: which
raw files fed it (and which were gated out), the gate, and per-query
sample counts.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_STAMP_RE = re.compile(r"BENCH_RAW_(\d{8}-\d{6})")
# Any evidence artifact bench.py writes carries the session's UTC stamp:
# BENCH_RAW_<stamp>[ -subset|-quick ].json, BENCH_CANARY_<stamp>.jsonl,
# BENCH_STREAMPROF_<stamp>.jsonl, BENCH_MMPROF_<stamp>/ (dir).
_SESSION_RE = re.compile(r"^BENCH_[A-Z]+_(\d{8}-\d{6})")

# Retention (VERDICT r10 #7): how many most-recent sessions survive a
# prune in addition to every session the committed record references.
KEEP_LAST_SESSIONS = 8

# Canary gate (VERDICT r11 #7): the in-session fixed-cost canary is a
# better contention signal than ambient load1 (BASELINE.md r11
# calibration: calm full-suite sessions read 0.08-0.45 s absolute with
# max_over_p25 <= ~2.5; a contended canary reads >1 s). A raw whose own
# canary block exceeds either bound ran inside a load window — its
# seconds must not feed the committed medians even if its load1 floor
# squeaked under the ambient gate (the floor is sampled at query START;
# a window opening mid-suite dodges it). Raws without a canary block
# (pre-r11) fall through to the load1 gate alone.
CANARY_MAX_OVER_P25 = 3.5
CANARY_MAX_SEC = 1.0

# Any UTC session stamp cited anywhere in a committed record — the
# promotion provenance of BENCH_FULL.json (raw_files_used AND
# raw_files_gated_out: a gated-out raw is arbitration evidence) or the
# prose of BASELINE.md (RAW/MMPROF/CANARY citations in scale and
# adjudication sections) — must survive pruning forever (ADVICE r11 #2).
# NOT \b-anchored: stamps appear after underscores (BENCH_RAW_<stamp>)
# and \b does not match between word chars; digit lookarounds instead.
_ANY_STAMP_RE = re.compile(r"(?<![0-9])(\d{8}-\d{6})(?![0-9])")


def _run_stamp(path_or_name: str):
    """UTC run stamp embedded in a raw record's filename, or None."""
    m = _STAMP_RE.search(os.path.basename(path_or_name))
    return m.group(1) if m else None


def _session_stamp(name: str):
    """UTC session stamp of ANY evidence artifact (raw/canary/streamprof/
    mmprof), or None for files that don't follow the bench naming."""
    m = _SESSION_RE.match(name)
    return m.group(1) if m else None


def prune_evidence(evidence_dir: str, full_path: str,
                   keep_last: int = KEEP_LAST_SESSIONS) -> dict:
    """Bound .bench_evidence growth (VERDICT r10 #7 / ADVICE r9 #4).

    Retention rule: an artifact survives iff its session stamp is
    (a) cited ANYWHERE in a committed record — the full text of
    ``BENCH_FULL.json`` (which covers ``promotion.raw_files_used`` and
    ``promotion.raw_files_gated_out``: gated-out raws are the
    arbitration evidence for WHY they were excluded) or of
    ``BASELINE.md`` next to it (scale-leg and adjudication sections
    cite RAW/MMPROF/CANARY stamps in prose) — cited sessions must stay
    auditable forever (ADVICE r11 #2) — or
    (b) among the ``keep_last`` most recent session stamps present in
    the directory (un-promoted evidence from recent iteration), or
    (c) not a bench session artifact at all (unknown names are never
    deleted — the prune only manages what bench.py itself wrote).
    Returns a summary dict; deletes nothing on a missing dir.
    """
    import shutil

    summary = {"kept_referenced": [], "kept_recent": [], "deleted": []}
    if not os.path.isdir(evidence_dir):
        return summary
    referenced: set[str] = set()
    cited_docs = [full_path,
                  os.path.join(os.path.dirname(full_path), "BASELINE.md")]
    for doc in cited_docs:
        if os.path.exists(doc):
            with open(doc) as f:
                referenced.update(_ANY_STAMP_RE.findall(f.read()))
    entries = sorted(os.listdir(evidence_dir))
    stamps = sorted({s for s in (_session_stamp(e) for e in entries) if s})
    recent = set(stamps[-keep_last:]) if keep_last > 0 else set()
    for entry in entries:
        st = _session_stamp(entry)
        if st is None:
            continue  # never touch names the bench didn't write
        if st in referenced:
            summary["kept_referenced"].append(entry)
            continue
        if st in recent:
            summary["kept_recent"].append(entry)
            continue
        path = os.path.join(evidence_dir, entry)
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except OSError:
                continue
        summary["deleted"].append(entry)
    return summary


def main() -> None:
    gate = 5.0
    last_n = None
    include_all = False
    do_prune = True
    prune_only = False
    files: list[str] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--gate" and i + 1 < len(args):
            gate = float(args[i + 1])
            i += 2
        elif args[i] == "--last" and i + 1 < len(args):
            last_n = int(args[i + 1])
            i += 2
        elif args[i] == "--all":
            include_all = True
            i += 1
        elif args[i] == "--no-prune":
            do_prune = False
            i += 1
        elif args[i] == "--prune-only":
            prune_only = True
            i += 1
        else:
            files.append(args[i])
            i += 1
    full_path = os.path.join(HERE, "BENCH_FULL.json")
    if prune_only:
        summary = prune_evidence(
            os.path.join(HERE, ".bench_evidence"), full_path)
        print(json.dumps({k: len(v) for k, v in summary.items()}))
        return
    prior: dict = {}
    if os.path.exists(full_path):
        with open(full_path) as f:
            prior = json.load(f)
    prior_q = prior.get("queries", {})

    if not files:
        files = sorted(
            glob.glob(os.path.join(HERE, "BENCH_RAW_*.json"))
            + glob.glob(os.path.join(HERE, ".bench_evidence",
                                     "BENCH_RAW_*.json")))
        # Default bound (ADVICE r9): only raw runs newer than the
        # committed record — a promotion reflects CURRENT code, not the
        # accumulated history of the evidence dir. Explicit file args
        # and --all bypass; --last N tightens further. The cutoff is the
        # LATEST RUN STAMP the prior promotion used (embedded in the
        # filenames bench.py writes), not the record file's mtime — a
        # git checkout resets mtime to now, and promotion itself bumps
        # it, either of which would silently shrink the default pool to
        # nothing / median-of-1 (self-review r10).
        cutoff = max(
            (_run_stamp(name) for name in
             prior.get("promotion", {}).get("raw_files_used", [])),
            default=None)
        if not include_all and cutoff is not None:
            files = [p for p in files
                     if (_run_stamp(p) or "") > cutoff]
        elif not include_all and os.path.exists(full_path):
            files = [p for p in files
                     if os.path.getmtime(p) > os.path.getmtime(full_path)]
        if last_n is not None:
            files = sorted(files, key=os.path.getmtime)[-last_n:]
    if not files:
        raise SystemExit(
            "no BENCH_RAW_*.json records newer than the last promotion to "
            "promote (pass --all to consider the full evidence dir)")

    samples: dict[str, list[float]] = {}
    subset_samples: dict[str, list[float]] = {}
    # sf guard: scale-leg subset raws (bench --only --raw at sf1/sf10
    # scratch dirs) land in the same evidence dir; merging their
    # per-query seconds into the sf0.1 medians would silently inflate
    # the record. Only raws at the committed record's sf qualify.
    sf = prior.get("sf")
    micro = None
    used, gated_out = [], []
    for path in files:
        with open(path) as f:
            rec = json.load(f)
        rec_sf = rec.get("sf")
        # A raw with NO sf field is untrusted, not exempt: when the
        # prior record pins an sf, a legacy/hand-trimmed raw missing
        # the field must be gated out, else it bypasses the very
        # contamination guard this loop exists for (ADVICE r10).
        if sf is not None and rec_sf != sf:
            gated_out.append(os.path.basename(path) + f" (sf={rec_sf})")
            continue
        loads = rec.get("load1", {})
        floor = min(loads.values()) if loads else None
        if floor is None or floor > gate:
            gated_out.append(os.path.basename(path))
            continue
        # In-session canary gate (VERDICT r11 #7): the session's OWN
        # fixed-cost samples out-rank the ambient floor — a window that
        # opens mid-suite inflates the canary even when the start-of-run
        # load1 floor passed.
        canary = rec.get("canary") or {}
        c_ratio = canary.get("max_over_p25")
        c_max = canary.get("max_sec")
        if ((c_ratio is not None and c_ratio > CANARY_MAX_OVER_P25)
                or (c_max is not None and c_max > CANARY_MAX_SEC)):
            gated_out.append(
                os.path.basename(path)
                + f" (canary max_over_p25={c_ratio}, max_sec={c_max})")
            continue
        used.append(os.path.basename(path))
        sf = rec_sf if sf is None else sf
        micro = rec.get("micro", micro)
        # Subset/quick raws run SOLO: they pay session cold-start the
        # in-suite rows never see, so their seconds are not comparable
        # to full-run rows. They only fill queries with NO full-run
        # sample (how new queries get a row without a full re-run) —
        # a full-run sample always wins.
        is_subset = ("-subset" in os.path.basename(path)
                     or "-quick" in os.path.basename(path))
        sink = subset_samples if is_subset else samples
        for name, sec in rec.get("queries", {}).items():
            sink.setdefault(name, []).append(sec)
    # fill ONLY queries that have neither a full-run sample nor a
    # committed median: a solo sample must never replace an in-suite
    # row, whether fresh or previously committed (self-review r10)
    subset_filled = sorted(
        name for name in subset_samples
        if name not in samples and name not in prior_q)
    for name in subset_filled:
        samples[name] = subset_samples[name]

    queries: dict[str, float] = {}
    counts: dict[str, int] = {}
    kept_prior: list[str] = []
    for name in sorted(set(samples) | set(prior_q)):
        if samples.get(name):
            queries[name] = round(statistics.median(samples[name]), 3)
            counts[name] = len(samples[name])
        else:
            queries[name] = prior_q[name]
            kept_prior.append(name)
    queries = dict(sorted(queries.items(), key=lambda kv: kv[1]))

    payload = {
        "metric": "suite_wall",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf if sf is not None else prior.get("sf"),
        "promotion": {
            "gate_ambient_load1": gate,
            "raw_files_used": used,
            "raw_files_gated_out": gated_out,
            "samples_per_query": counts,
            "kept_prior_no_calm_sample": kept_prior,
            "queries_filled_from_subset_runs": subset_filled,
        },
    }
    if micro or prior.get("micro"):
        payload["micro"] = micro or prior.get("micro")
    with open(full_path, "w") as f:
        json.dump(payload, f, indent=1)
    out = {
        "promoted": len(counts), "kept_prior": len(kept_prior),
        "suite_wall": payload["value"], "gate": gate,
        "runs_used": len(used), "runs_gated_out": len(gated_out),
    }
    if do_prune:
        summary = prune_evidence(
            os.path.join(HERE, ".bench_evidence"), full_path)
        out["pruned"] = len(summary["deleted"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
