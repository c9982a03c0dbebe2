"""fid_weights_probe: asset-appears -> evidence, hands-free (VERDICT r4 #7).

The capture queue runs scripts/fid_weights_probe.py every round; these
tests pin both sides of its contract so the stage can be trusted to fire
correctly the moment InceptionV3 weights show up:

- no weights: one JSON line, status "absent", exit 0 (queue success);
- weights present (synthetic torchvision-format state dict): the probe
  loads them through the production path, self-checks the pool3 forward,
  and emits a real Inception-FID sanity pair (FID(a,a)=0 < FID(a,b)).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
SCRIPT = ROOT / "scripts" / "fid_weights_probe.py"


def _run(env_extra):
    import os

    env = {**os.environ, "OTM_FID_PROBE_CPU": "1", **env_extra}
    out = subprocess.run(
        [sys.executable, str(SCRIPT)], capture_output=True, text=True,
        env=env, timeout=600, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, out.stdout
    return json.loads(lines[0])


def test_probe_absent_is_clean_success(tmp_path):
    record = _run({"OTM_INCEPTION_WEIGHTS": str(tmp_path / "nope.npz"),
                   "HOME": str(tmp_path)})  # hide any real cache dir
    assert record["status"] == "absent"
    assert "random-projection" in record["detail"]


@pytest.mark.slow
def test_probe_turns_weights_into_evidence(tmp_path):
    from tests.test_metrics import _random_tv_state_dict

    state = _random_tv_state_dict(seed=11)
    npz = tmp_path / "inception_v3_synth.npz"
    np.savez(npz, **state)
    record = _run({"OTM_INCEPTION_WEIGHTS": str(npz)})
    assert record["status"] == "ok", record
    assert record["extractor"].startswith("inception"), record
    assert record["pool3_shape_ok"] is True
    assert abs(record["fid_self"]) < 1e-3
    # random-init weights can collapse features (cross-FID ~ 0); with real
    # weights the probe's internal fid_ab >= fid_aa check still applies
    assert record["fid_cross_synthetic"] >= record["fid_self"]
