"""Condition-response calibration (round 4): requested -> internal cond map.

Measured motivation (BASELINE.md round 3; artifacts/eval_cond_32_cm4_repair
.json): conditioning on the shipped conditional_32 path is CAUSAL in
direction (min Pearson r 0.899 over the four dims) but attenuated in
magnitude — response slopes 0.027 (hazard_frac), 0.037 (coin_frac), 0.30
(goal_dist) vs the ideal 1.0, so a user requesting hazard_frac 0.06 gets
roughly corpus-mean + epsilon.  The attenuation is a smooth, monotone
property of the trained generator, so it is invertible: sweep the INTERNAL
condition input over a widened range (several multiples of the corpus
q10-q90 band — the model responds continuously well outside the corpus
feature range), measure the REALIZED feature of the generated levels at
each point, and store the (internal, realized) curve per dim.  At
generate/export time the user's requested value is mapped through the
inverse curve (interp over realized -> internal), so requested ~= realized
wherever the model can physically reach the request.

The calibration is a per-dim diagonal map fitted around the corpus mean of
the other dims (the same operating point the causality gate evaluates).
Outside the measured realized range the map CLAMPS to the widest internal
value measured — the model cannot realize more than it can realize; the
achievable [realized_min, realized_max] band is stored in the JSON so
consumers can check a request against it.

Fitted by ``tools/eval_cond --fit-calibration`` (stored as
``cond_calibration.json`` next to the checkpoint), applied by
``tools/eval_cond --calibrated`` and ``levelgan-export --calibrated``.
Reference parity: no equivalent (the reference's conditioning is
uncalibrated [TK-L], SURVEY.md R10); this is a pure post-fit artifact — the
trained model and its gates are unchanged.
"""

from __future__ import annotations

import json
import os

import numpy as np

CAL_FILENAME = "cond_calibration.json"


def fit_from_sweeps(feature_names, sweeps: dict, meta: dict | None = None
                    ) -> dict:
    """Build a calibration from per-dim internal-sweep measurements.

    sweeps: name -> {"internal": [P], "realized": [P]} (NaN realized points
    — e.g. goal_dist unmeasurable at extreme internals — are dropped).
    Realized is made monotone non-decreasing along increasing internal via
    a running max (the causality gate guarantees the net response is
    positive on every dim it passes), with an epsilon tie-break so the
    inverse interp stays well-defined.
    """
    cal = {"feature_names": list(feature_names), "dims": {}}
    cal.update(meta or {})
    for name, row in sweeps.items():
        internal = np.asarray(row["internal"], np.float64)
        realized = np.asarray(row["realized"], np.float64)
        ok = np.isfinite(realized) & np.isfinite(internal)
        internal, realized = internal[ok], realized[ok]
        if len(internal) < 2:
            continue
        order = np.argsort(internal)
        internal, realized = internal[order], realized[order]
        realized = np.maximum.accumulate(realized)
        realized = realized + np.arange(len(realized)) * 1e-9
        cal["dims"][name] = {
            "internal": internal.tolist(),
            "realized": realized.tolist(),
            "achievable": [float(realized[0]), float(realized[-1])],
        }
    return cal


def apply_calibration(cal: dict, cond: np.ndarray) -> np.ndarray:
    """Map a requested feature vector (user space) to the internal cond.

    cond: [..., cond_dim] in the order of ``cal['feature_names']``.
    Dims without a fitted curve pass through unchanged; requests outside a
    dim's achievable band clamp to the widest measured internal value.
    """
    cond = np.asarray(cond, np.float32)
    out = cond.copy()
    for d, name in enumerate(cal["feature_names"]):
        row = cal["dims"].get(name)
        if not row or d >= cond.shape[-1]:
            continue
        out[..., d] = np.interp(cond[..., d], row["realized"],
                                row["internal"]).astype(np.float32)
    return out


def calibration_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, CAL_FILENAME)


def save_calibration(ckpt_dir: str, cal: dict) -> str:
    path = calibration_path(ckpt_dir)
    with open(path, "w") as f:
        json.dump(cal, f, indent=2)
        f.write("\n")
    return path


def load_calibration(ckpt_dir: str) -> dict:
    path = calibration_path(ckpt_dir)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no {CAL_FILENAME} under {ckpt_dir!r} — fit one with "
            "`python -m tools.eval_cond --ckpt <dir> --fit-calibration`")
    with open(path) as f:
        return json.load(f)
