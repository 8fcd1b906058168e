"""Condition-response calibration (lio/calibration.py, round 4).

The measured conditional_32 response is causal in direction but 3-30x
attenuated in magnitude (slopes 0.027-0.30, BASELINE.md round 3); the
calibration inverts the monotone internal->realized curve so requested ~=
realized in user space.  These tests pin the fit/apply machinery on
synthetic response curves; the on-model numbers are recorded by
``tools/eval_cond --fit-calibration`` artifacts.
"""

import json

import numpy as np
import pytest

from levelgan.lio.calibration import (CAL_FILENAME, apply_calibration,
                                      calibration_path, fit_from_sweeps,
                                      load_calibration, save_calibration)

NAMES = ("wall_frac", "hazard_frac", "coin_frac", "goal_dist")


def _attenuated_sweep(slope, intercept, lo=-2.0, hi=2.0, n=9):
    internal = np.linspace(lo, hi, n)
    return {"internal": internal.tolist(),
            "realized": (slope * internal + intercept).tolist()}


def test_inverts_attenuated_linear_response():
    # realized = 0.1*internal + 0.2 -> requesting r must select
    # internal = (r - 0.2)/0.1, so the calibrated response has slope 1
    cal = fit_from_sweeps(NAMES, {"wall_frac": _attenuated_sweep(0.1, 0.2)})
    req = np.array([[0.05, 0.5, 0.5, 0.5], [0.3, 0.5, 0.5, 0.5]], np.float32)
    out = apply_calibration(cal, req)
    np.testing.assert_allclose(out[:, 0], (req[:, 0] - 0.2) / 0.1, atol=1e-4)
    # untouched dims pass through
    np.testing.assert_allclose(out[:, 1:], req[:, 1:])


def test_realized_matches_requested_through_model():
    # end to end on a synthetic "model": generate at calibrated internal,
    # measure with the same response law -> realized == requested
    slope, icpt = 0.027, 0.04          # the measured hazard attenuation
    cal = fit_from_sweeps(NAMES, {"hazard_frac": _attenuated_sweep(
        slope, icpt, lo=-1.5, hi=1.5)})
    for want in (0.02, 0.04, 0.07):
        req = np.array([0.5, want, 0.5, 0.5], np.float32)
        internal = apply_calibration(cal, req)[1]
        assert slope * internal + icpt == pytest.approx(want, abs=1e-4)


def test_clamps_outside_achievable_band():
    cal = fit_from_sweeps(NAMES, {"wall_frac": _attenuated_sweep(0.1, 0.2,
                                                                 lo=-1, hi=1)})
    lo_a, hi_a = cal["dims"]["wall_frac"]["achievable"]
    out_hi = apply_calibration(cal, np.array([9.9, 0, 0, 0], np.float32))[0]
    out_lo = apply_calibration(cal, np.array([-9.9, 0, 0, 0], np.float32))[0]
    assert out_hi == pytest.approx(1.0, abs=1e-3)    # widest internal swept
    assert out_lo == pytest.approx(-1.0, abs=1e-3)
    assert lo_a == pytest.approx(0.1, abs=1e-3)      # 0.1*(-1)+0.2
    assert hi_a == pytest.approx(0.3, abs=1e-3)


def test_noisy_nonmonotone_response_is_isotonized():
    rng = np.random.default_rng(0)
    internal = np.linspace(-2, 2, 17)
    realized = 0.3 * internal + 0.02 * rng.standard_normal(17)
    cal = fit_from_sweeps(NAMES, {"goal_dist": {
        "internal": internal.tolist(), "realized": realized.tolist()}})
    r = np.asarray(cal["dims"]["goal_dist"]["realized"])
    assert (np.diff(r) >= 0).all()
    # inverse still tracks the underlying law to ~noise level
    req = np.array([0, 0, 0, 0.3], np.float32)
    got = apply_calibration(cal, req)[3]
    assert 0.3 * got == pytest.approx(0.3, abs=0.1)


def test_nan_points_dropped():
    sweep = _attenuated_sweep(0.5, 0.0)
    sweep["realized"][0] = float("nan")     # unmeasurable extreme point
    cal = fit_from_sweeps(NAMES, {"wall_frac": sweep})
    assert len(cal["dims"]["wall_frac"]["internal"]) == 8


def test_save_load_roundtrip(tmp_path):
    cal = fit_from_sweeps(NAMES, {"wall_frac": _attenuated_sweep(0.1, 0.2)},
                          meta={"preset": "conditional_32"})
    path = save_calibration(str(tmp_path), cal)
    assert path == calibration_path(str(tmp_path))
    loaded = load_calibration(str(tmp_path))
    assert loaded == json.loads(json.dumps(cal))     # JSON-stable
    assert loaded["preset"] == "conditional_32"


def test_load_missing_is_actionable(tmp_path):
    with pytest.raises(FileNotFoundError, match=CAL_FILENAME):
        load_calibration(str(tmp_path))
