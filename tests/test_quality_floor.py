"""End-to-end quality floor: the quality_run harness (VERDICT #3) must fit a
synthesized multi-camera capture to a sane held-out PSNR even at smoke scale.

The full-scale artifact (100 cams, 30k steps on TPU) lives in
docs/artifacts/quality_run; this test keeps the harness itself honest in CI
by running its --smoke config (6 cams, 96x64, 60 steps) and asserting the
held-out PSNR floor. Reference analog: the 30k-iter south-building run
producing opacity.pt (gs_control.py:24-49, 226-231) — which published no
quality number at all.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_quality_run_smoke_psnr_floor(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = tmp_path / "qr"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "quality_run.py"),
         "--smoke", "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads((out / "summary.json").read_text())
    # 60 steps from 400 SfM points: a blurry but clearly converging fit.
    # Observed 18.99 dB; 15 dB is far above a non-fit (uniform gray ~8 dB).
    assert summary["holdout_psnr"] >= 15.0, summary
    assert summary["holdout_ssim"] >= 0.25, summary
    # per-step metrics and eval curve were written
    assert (out / "metrics.jsonl").exists()
    assert (out / "eval.jsonl").exists()
