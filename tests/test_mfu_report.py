"""tools/mfu_report: the per-preset MFU rollup table (round 5)."""

import json

from tools.mfu_report import PEAK_HBM_GBPS, limiter, main


def test_limiter_classification():
    assert limiter(0.4, 1.4).startswith("compute") or limiter(0.4, 1.4) == "HBM-bound"
    assert limiter(0.05, 0.1).startswith("MXU-starved")
    assert limiter(0.1, 0.9) == "HBM-bound"
    assert limiter(0.5, 0.6) == "compute-led"


def test_table_from_profile_jsons(tmp_path, capsys):
    prof = {"preset": "fake_16", "overrides": {},
            "ms_per_step_wall": 1.0, "ms_per_step_device": 0.8,
            "flops_per_step": 100e9, "bytes_per_step": 50e6,
            "achieved_tflops_device": 125.0, "peak_tflops_bf16": 197.0,
            "mfu_device": 0.63, "mfu_wall": 0.51,
            "hbm_gbps_device": 62.5}
    (tmp_path / "profile_fake_16.json").write_text(json.dumps(prof))
    # a pre-round-5 profile without MFU fields is skipped, not fatal
    (tmp_path / "profile_old.json").write_text(json.dumps({"preset": "old"}))
    out_md = tmp_path / "mfu.md"
    assert main(["--dir", str(tmp_path), "--out", str(out_md)]) == 0
    text = out_md.read_text()
    assert "fake_16" in text and "0.630" in text and "old" not in text
