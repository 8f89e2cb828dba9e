"""Evidence-dir retention (VERDICT r10 #7): .bench_evidence must stay
bounded — a prune keeps (a) every session the committed BENCH_FULL.json
promotion references, (b) the KEEP_LAST_SESSIONS most recent sessions,
(c) anything bench.py didn't write; everything else is deleted."""

import importlib.util
import json
import os


def _load_mod():
    spec = importlib.util.spec_from_file_location(
        "promote_bench", "/root/repo/scripts/promote_bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _mk_session(ev, stamp, *, raw=True):
    """Materialize one bench session's artifact family for ``stamp``."""
    names = []
    if raw:
        names.append(f"BENCH_RAW_{stamp}.json")
    names += [f"BENCH_CANARY_{stamp}.jsonl", f"BENCH_STREAMPROF_{stamp}.jsonl"]
    for n in names:
        (ev / n).write_text("{}")
    mm = ev / f"BENCH_MMPROF_{stamp}"
    mm.mkdir()
    (mm / "worker-0.jsonl").write_text("{}")
    return names + [mm.name]


def test_prune_keeps_referenced_and_recent_sessions(tmp_path):
    mod = _load_mod()
    ev = tmp_path / ".bench_evidence"
    ev.mkdir()
    # 12 sessions, oldest..newest; the committed record references #2
    stamps = [f"2026010{i // 10}-0{i % 10}0000" for i in range(12)]
    for s in stamps:
        _mk_session(ev, s)
    referenced = stamps[2]
    full = tmp_path / "BENCH_FULL.json"
    full.write_text(json.dumps({
        "queries": {"q": 1.0}, "sf": 0.1,
        "promotion": {"raw_files_used": [f"BENCH_RAW_{referenced}.json"]},
    }))
    # a foreign file must never be touched
    (ev / "NOTES.txt").write_text("hand notes")

    summary = mod.prune_evidence(str(ev), str(full), keep_last=3)

    surviving = sorted(os.listdir(ev))
    # referenced session survives in FULL (all four artifact kinds)
    for kind in ("RAW", "CANARY", "STREAMPROF", "MMPROF"):
        assert any(e.startswith(f"BENCH_{kind}_{referenced}")
                   for e in surviving), kind
    # the 3 most recent sessions survive
    for s in stamps[-3:]:
        assert any(referenced_e.startswith(f"BENCH_RAW_{s}")
                   for referenced_e in surviving)
    # everything else (sessions 0,1,3..8) is gone
    for s in stamps[:2] + stamps[3:-3]:
        assert not any(e.startswith(f"BENCH_RAW_{s}") for e in surviving), s
        assert not any(e.startswith(f"BENCH_MMPROF_{s}") for e in surviving)
    # unknown names untouched
    assert "NOTES.txt" in surviving
    # summary bookkeeping is consistent with the directory state
    assert len(summary["deleted"]) == 8 * 4
    assert all(referenced in e for e in summary["kept_referenced"])


def test_prune_only_cli_and_missing_dir(tmp_path, monkeypatch, capsys):
    mod = _load_mod()
    # missing dir: no-op, empty summary
    s = mod.prune_evidence(str(tmp_path / "nope"), str(tmp_path / "nope.json"))
    assert s == {"kept_referenced": [], "kept_recent": [], "deleted": []}
    # --prune-only exercises the same path end-to-end without promoting
    ev = tmp_path / ".bench_evidence"
    ev.mkdir()
    for i in range(10):
        _mk_session(ev, f"20260201-00000{i}" if i < 10 else "")
    monkeypatch.setattr(mod, "HERE", str(tmp_path))
    monkeypatch.setattr("sys.argv", ["promote_bench.py", "--prune-only"])
    mod.main()
    out = json.loads(capsys.readouterr().out)
    # 10 sessions, no committed record -> keep last KEEP_LAST_SESSIONS=8
    assert out["deleted"] == 2 * 4
    stamps_left = {mod._session_stamp(e) for e in os.listdir(ev)}
    assert len(stamps_left) == 8


def test_promotion_runs_prune_by_default(tmp_path, monkeypatch, capsys):
    """After a successful promotion the prune fires automatically; the
    raw the promotion just used AND the raws it gated out (arbitration
    evidence — ADVICE r11 #2) are in the referenced set, so only
    sessions absent from the committed provenance age out by recency."""
    mod = _load_mod()
    ev = tmp_path / ".bench_evidence"
    ev.mkdir()
    # 9 old sessions that the promotion will gate out (no load1 floor)
    for i in range(9):
        _mk_session(ev, f"20200101-00000{i}")
    # 2 even-older sessions with NO raw file at all (canary/profiler
    # orphans from killed runs): never referenced by any provenance
    for i in range(2):
        stamp = f"20190101-00000{i}"
        (ev / f"BENCH_CANARY_{stamp}.jsonl").write_text("")
        (ev / f"BENCH_STREAMPROF_{stamp}.jsonl").write_text("")
    fresh = "20990101-000000"
    (ev / f"BENCH_RAW_{fresh}.json").write_text(json.dumps(
        {"queries": {"q": 2.0}, "load1": {"q": 1.0}, "sf": 0.1}))
    monkeypatch.setattr(mod, "HERE", str(tmp_path))
    monkeypatch.setattr("sys.argv", ["promote_bench.py", "--all"])
    mod.main()
    out = json.loads(capsys.readouterr().out)
    # only the fresh raw has samples; the 9 empty ones are load-gated out
    assert out["runs_used"] == 1
    # retention after the promotion: the fresh raw is used, the 9 gated
    # raws are cited in raw_files_gated_out (kept — ADVICE r11 #2); only
    # the 2 orphan sessions (2 artifacts each) are prunable, and they
    # fall outside the 8 most recent of the 12 stamps present
    assert out["pruned"] == 2 * 2
    full = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert f"BENCH_RAW_{fresh}.json" in full["promotion"]["raw_files_used"]
    # every gated-out session's artifacts survive
    for i in range(9):
        assert any(e.startswith(f"BENCH_RAW_20200101-00000{i}")
                   for e in os.listdir(ev)), i
    left = sorted(os.listdir(ev))
    assert f"BENCH_RAW_{fresh}.json" in left
    # the orphan sessions (no raw, no citation) are the ones that aged out
    assert not any("20190101-" in e for e in left)
