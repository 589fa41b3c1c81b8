"""The plan-fingerprint-aware driver gate (verification.py): a green
driver hash only counts while the query's plan fingerprint still
matches the one recorded at verification time — a rewritten plan must
re-queue to the front of queries() for a fresh driver hash (round-7
verdict item 1: the 16 distributed-rank rewrites shipped without one
because the old gate treated 'verified once' as 'verified forever')."""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

from cost_of_living_data_etl_spark.verification import (
    CURRENT_FP,
    VERIFIED_FP,
    sync_verified_fingerprints,
    verified_names,
)

REPO = Path(__file__).resolve().parent.parent


def _write(repo: Path, rel: str, data: dict) -> None:
    p = repo / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(data))


def _fake_repo(
    tmp_path: Path,
    *,
    correctness: dict[int, dict] | None = None,
    current: dict | None = None,
    verified: dict | None = None,
) -> Path:
    for r, data in (correctness or {}).items():
        _write(tmp_path, f"CORRECTNESS_r{r:02d}.json", data)
    if current is not None:
        _write(tmp_path, CURRENT_FP, current)
    if verified is not None:
        _write(tmp_path, VERIFIED_FP, verified)
    return tmp_path


GREEN = {"hash_match": True, "rows_match": True, "err": None}
RED = {"hash_match": False, "rows_match": True, "err": "boom"}


def test_changed_fingerprint_drops_verified_status(tmp_path):
    repo = _fake_repo(
        tmp_path,
        correctness={1: {"a": GREEN, "b": GREEN, "c": RED}},
        current={"sf": "sfX", "fingerprints": {"a": "f1", "b": "NEW", "c": "f3"}},
        verified={
            "sf": "sfX",
            "synced_through": 1,
            "fingerprints": {"a": "f1", "b": "OLD"},
        },
    )
    # a: fingerprint unchanged -> verified; b: rewritten -> re-queued;
    # c: never green -> unverified regardless of fingerprints
    assert verified_names(repo) == {"a"}


def test_missing_maps_fall_back_to_green_rule(tmp_path):
    repo = _fake_repo(tmp_path, correctness={1: {"a": GREEN, "b": RED}})
    assert verified_names(repo) == {"a"}


def test_sf_mismatch_disables_invalidation(tmp_path):
    repo = _fake_repo(
        tmp_path,
        correctness={1: {"a": GREEN}},
        current={"sf": "sfY", "fingerprints": {"a": "NEW"}},
        verified={"sf": "sfX", "synced_through": 1, "fingerprints": {"a": "OLD"}},
    )
    # maps describe different SFs -> fingerprints not comparable -> legacy rule
    assert verified_names(repo) == {"a"}


def test_name_missing_from_either_map_stays_verified(tmp_path):
    repo = _fake_repo(
        tmp_path,
        correctness={1: {"a": GREEN, "b": GREEN}},
        current={"sf": "sfX", "fingerprints": {"a": "f1"}},
        verified={"sf": "sfX", "synced_through": 1, "fingerprints": {"b": "f2"}},
    )
    # invalidation needs BOTH sides known; conservative otherwise
    assert verified_names(repo) == {"a", "b"}


def test_sync_folds_new_greens_and_is_idempotent(tmp_path):
    repo = _fake_repo(
        tmp_path,
        correctness={1: {"a": GREEN}, 2: {"b": GREEN, "c": RED}},
        current={"sf": "sfX", "fingerprints": {"a": "f1", "b": "f2", "c": "f3"}},
        verified={"sf": "sfX", "synced_through": 1, "fingerprints": {"a": "f1"}},
    )
    v = sync_verified_fingerprints(repo)
    assert v["synced_through"] == 2
    assert v["fingerprints"] == {"a": "f1", "b": "f2"}  # c red -> excluded
    # idempotent within the round: a post-edit fingerprint must NOT leak
    # into the verified map on a second bench run
    _write(repo, CURRENT_FP, {"sf": "sfX", "fingerprints": {"a": "f1", "b": "EDITED"}})
    v2 = sync_verified_fingerprints(repo)
    assert v2["fingerprints"]["b"] == "f2"
    assert verified_names(repo) == {"a"}  # and b is now re-queued


def test_sync_without_verified_map_bootstraps(tmp_path):
    repo = _fake_repo(
        tmp_path,
        correctness={1: {"a": GREEN}},
        current={"sf": "sfX", "fingerprints": {"a": "f1"}},
    )
    v = sync_verified_fingerprints(repo)
    assert v == {"sf": "sfX", "synced_through": 1, "fingerprints": {"a": "f1"}}
    assert json.loads((repo / VERIFIED_FP).read_text()) == v


def test_bootstrap_stamps_only_newest_round_with_current(tmp_path):
    """ADVICE r08: a fresh bootstrap must not vouch for OLD greens with
    TODAY's fingerprints — a plan rewritten since its round-1 green
    would otherwise ship as 'verified' without a fresh driver hash.
    Old greens get a stale: sentinel (re-queue); a name green again in
    the newest round is stamped current (ascending fold order)."""
    repo = _fake_repo(
        tmp_path,
        correctness={
            1: {"old_only": GREEN, "green_twice": GREEN},
            3: {"new_only": GREEN, "green_twice": GREEN},
        },
        current={
            "sf": "sfX",
            "fingerprints": {"old_only": "f1", "new_only": "f2", "green_twice": "f3"},
        },
    )
    v = sync_verified_fingerprints(repo)
    assert v["synced_through"] == 3
    assert v["fingerprints"]["old_only"] == "stale:r1"
    assert v["fingerprints"]["new_only"] == "f2"
    assert v["fingerprints"]["green_twice"] == "f3"
    assert verified_names(repo) == {"new_only", "green_twice"}


def test_sync_fails_loudly_on_corrupt_verified_map(tmp_path):
    """An existing-but-unparseable map must raise, not silently
    re-bootstrap (which would stamp every historical green with the
    current fingerprint)."""
    import pytest

    repo = _fake_repo(
        tmp_path,
        correctness={1: {"a": GREEN}},
        current={"sf": "sfX", "fingerprints": {"a": "f1"}},
    )
    (repo / VERIFIED_FP).parent.mkdir(parents=True, exist_ok=True)
    (repo / VERIFIED_FP).write_text("{not json")
    with pytest.raises(ValueError, match="refusing"):
        sync_verified_fingerprints(repo)


# --- the real repo state: round-7 rewrites must re-queue ---------------------

REWRITTEN_R07 = [
    "q_ppl_filter_retention_curve", "q_negative_sampling_pairs",
    "q_zorder_layout_manifest", "q_window_ntile_price_quartiles",
    "q_quality_dup_deciles", "q_quality_decile_mix", "q_rfm_segments",
    "q_conformal_interval_ridge", "q_theilsen_revenue_trend",
    "q15_top_supplier", "q_spearman_price_quantity", "q_auc_quality_dup",
    "q_ks_two_sample", "q_wasserstein_arm_shift",
    "q_concurrent_sessions_peak", "q_t_closeness_audit",
]


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_r07_rewrites_requeue_to_front_of_queries():
    """Until CORRECTNESS_r08 lands a fresh green for them, the 16
    round-7 rewrites (sentinel-seeded in verified_fingerprints.json)
    are unverified and lead the driver's sample order."""
    verified = verified_names(REPO)
    seed = json.loads((REPO / VERIFIED_FP).read_text())
    still_stale = [
        n for n in REWRITTEN_R07
        if str(seed["fingerprints"].get(n, "")).startswith("stale:")
    ]
    if not still_stale:  # a later round's sync re-verified them all
        return
    for name in still_stale:
        assert name not in verified
    order = list(_entry_module().queries())
    n_unverified = len(order) - len(verified & set(order))
    front = set(order[:n_unverified])
    assert set(still_stale) <= front
