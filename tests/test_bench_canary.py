"""bench.py's drift canary: the ~15 cheap, plan-stable queries whose
total normalizes cross-round bench comparisons (SCALE.md 'Drift
canary'). The set must stay resolvable against the catalog and the
reference-lookup must pick the newest same-SF snapshot that has every
canary timing."""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_canary_names_resolve_in_catalog():
    from cost_of_living_data_etl_spark.plans import catalog

    bench = _bench()
    cat = catalog()
    missing = [c for c in bench.CANARY if c not in cat]
    assert not missing, missing
    assert len(bench.CANARY) >= 12  # big enough to average out per-query noise
    assert len(set(bench.CANARY)) == len(bench.CANARY)


def test_canary_reference_prefers_newest_complete_snapshot(tmp_path, monkeypatch):
    bench = _bench()
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    hist = tmp_path / "history"
    hist.mkdir()
    full = {c: 0.5 for c in bench.CANARY}
    # r05: complete at the right SF; r06: wrong SF; r07: missing one canary
    (hist / "bench_full_r05.json").write_text(
        json.dumps({"sf": bench.SF_DIR, "queries": full})
    )
    (hist / "bench_full_r06.json").write_text(
        json.dumps({"sf": "elsewhere", "queries": {c: 9.9 for c in bench.CANARY}})
    )
    partial = dict(full)
    partial.pop(bench.CANARY[0])
    (hist / "bench_full_r07.json").write_text(
        json.dumps({"sf": bench.SF_DIR, "queries": partial})
    )
    total, rnd = bench._canary_reference(round_n=8)
    assert rnd == 5
    assert total == round(0.5 * len(bench.CANARY), 3)


def test_canary_reference_none_when_no_snapshot(tmp_path, monkeypatch):
    bench = _bench()
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    assert bench._canary_reference(round_n=8) == (None, None)
