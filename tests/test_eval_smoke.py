"""Integration: the one-command offline eval pipeline (VERDICT r1 item 5).

fixture dataset -> GAN train -> sample -> finetune Inception -> IS/FID JSON,
all through the real CLIs in subprocesses (same chain as `make eval-smoke`).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_eval_smoke_pipeline(tmp_path):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "scripts/eval_smoke.py", "--out", str(tmp_path)],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=2400,
    )
    assert r.returncode == 0, r.stdout[-4000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["inception"] == "finetuned"
    assert rec["is_mean"] >= 1.0  # IS is bounded below by 1
    assert np.isfinite(rec["fid"]) and rec["fid"] >= 0
    assert rec["n_gen"] > 0
