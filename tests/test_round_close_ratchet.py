"""Unit test for the bench-regression ratchet (VERDICT r8 #4): the
round close must refuse to seal when any query's min-of-N regresses
past the gate vs the previous round's sealed BENCH_FULL copy, unless
the regression is explicitly allow-listed."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from round_close import check_bench_ratchet  # noqa: E402


def test_planted_regression_trips_the_gate():
    prev = {"q_fast": 0.2, "q_heavy": 2.0, "q_mid": 1.0}
    cur = {"q_fast": 0.25, "q_heavy": 3.5, "q_mid": 1.1}
    bad = check_bench_ratchet(prev, cur, allowlist={})
    assert bad == ["q_heavy: 2.00s -> 3.50s"]


def test_subfloor_jitter_does_not_trip():
    # 0.1 -> 0.4 is a 4x "regression" entirely inside scheduler jitter;
    # the absolute floor keeps it from blocking a seal.
    assert check_bench_ratchet({"q": 0.1}, {"q": 0.4}, allowlist={}) == []


def test_allowlist_and_new_queries_pass():
    prev = {"q_heavy": 2.0}
    cur = {"q_heavy": 9.0, "q_new": 5.0}
    assert (
        check_bench_ratchet(prev, cur, allowlist={"q_heavy": "rewrite"})
        == []
    )


def test_clean_round_seals():
    prev = {"a": 1.0, "b": 2.0}
    cur = {"a": 1.2, "b": 1.4}
    assert check_bench_ratchet(prev, cur, allowlist={}) == []


def test_shifted_job_floor_does_not_trip():
    # r10 failure mode: a post-reboot host added ~0.2s of fixed per-job
    # floor to every query; sub-second untouched queries then sat over
    # 1.5x across four windows AND a min-of-4 re-measure. The additive
    # jitter allowance absorbs the floor shift...
    prev = {"sim_pq_topk": 0.438, "graph_degree": 0.488, "dq_drift": 0.804}
    cur = {"sim_pq_topk": 0.673, "graph_degree": 0.760, "dq_drift": 1.218}
    assert check_bench_ratchet(prev, cur, allowlist={}) == []
    # ...while a real regression on the same magnitude still trips.
    assert check_bench_ratchet(
        {"sim_pq_topk": 0.438}, {"sim_pq_topk": 1.2}, allowlist={}
    ) == ["sim_pq_topk: 0.44s -> 1.20s"]


def test_fold_refuses_mismatched_engine_tree(tmp_path, monkeypatch):
    # ADVICE r10 (medium): a window recorded on a different engine tree
    # must be refused, not silently folded into the sealed minima.
    import json

    import round_close

    monkeypatch.setattr(round_close, "REPO", str(tmp_path))
    (tmp_path / "BENCH_FULL_local.json").write_text(json.dumps(
        {"queries": {"q": 2.0}, "value": 2.0, "engine_tree": "aaaa"}
    ))
    stale = tmp_path / "w_stale.json"
    stale.write_text(json.dumps(
        {"queries": {"q": 0.5}, "engine_tree": "bbbb"}
    ))
    try:
        round_close._fold_windows([str(stale)])
        raise AssertionError("stale-tree window folded")
    except SystemExit as e:
        assert e.code == 5
    # digest-less windows (pre-stamp format) are refused too
    nodigest = tmp_path / "w_nodigest.json"
    nodigest.write_text(json.dumps({"queries": {"q": 0.5}}))
    try:
        round_close._fold_windows([str(nodigest)])
        raise AssertionError("digest-less window folded")
    except SystemExit as e:
        assert e.code == 5


def test_fold_same_tree_takes_minima_and_records_provenance(
    tmp_path, monkeypatch
):
    import json

    import round_close

    monkeypatch.setattr(round_close, "REPO", str(tmp_path))
    (tmp_path / "BENCH_FULL_local.json").write_text(json.dumps(
        {"queries": {"q": 2.0, "r": 1.0}, "value": 3.0,
         "engine_tree": "aaaa"}
    ))
    w = tmp_path / "w.json"
    w.write_text(json.dumps(
        {"queries": {"q": 0.5, "gone_query": 9.0}, "engine_tree": "aaaa"}
    ))
    round_close._fold_windows([str(w)])
    out = json.loads((tmp_path / "BENCH_FULL_local.json").read_text())
    assert out["queries"] == {"q": 0.5, "r": 1.0}  # min folded, stale dropped
    assert out["value"] == 1.5
    assert out["windows_folded"] == 2
    (prov,) = out["windows_folded_files"]
    assert prov["path"] == str(w) and len(prov["sha256"]) == 64
