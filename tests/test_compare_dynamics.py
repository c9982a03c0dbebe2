"""scripts/compare_dynamics.py regression: the lazy-path equivalence
harness parses logs, rescales the lazy run's path series by its interval,
and enforces the documented bounds (exit 0 within, exit 1 outside)."""

import json
import subprocess
import sys
from pathlib import Path

SCRIPT = Path(__file__).parent.parent / "scripts" / "compare_dynamics.py"


def _log(path, interval, *, path_level=0.10, rec=0.05):
    hist = []
    for i, step in enumerate(range(100, 1100, 100)):
        on = (i % interval) == 0 if interval > 1 else True
        hist.append({
            "step": step,
            "rec_losses": rec,
            "idt_losses": 0.04,
            "style_losses": 0.03,
            "kl_losses": 0.2,
            "path_losses": path_level if on else 0.0,
            "ada_ps": 0.25,
            "disc_real_accs": 0.5,
            "disc_fake_accs": 0.5,
            "gan_losses": 0.4,
            "total_disc_losses": 0.2,
            "total_gen_losses": 1.0,
        })
    # interval means: the lazy run logs path_level on 1/interval of steps
    if interval > 1:
        for h in hist:
            h["path_losses"] = path_level / interval
    payload = {
        "steps": 1000, "size": 64, "batch": 4, "path_interval": interval,
        "wall_s": 10.0, "images_per_sec": 100.0, "history": hist,
    }
    path.write_text(json.dumps(payload))
    return path


def _run(anchor, lazy, out):
    return subprocess.run(
        [sys.executable, str(SCRIPT), str(anchor), str(lazy), str(out)],
        capture_output=True, text=True,
    )


def test_equivalent_runs_pass(tmp_path):
    a = _log(tmp_path / "a.json", 1)
    b = _log(tmp_path / "b.json", 4)
    r = _run(a, b, tmp_path / "out.png")
    assert r.returncode == 0, r.stdout + r.stderr
    assert (tmp_path / "out.png").exists()
    # the path series is rescaled by the interval before comparison
    assert "path(raw)  0.1000 vs 0.1000" in r.stdout, r.stdout


def test_divergent_runs_fail(tmp_path):
    a = _log(tmp_path / "a.json", 1)
    b = _log(tmp_path / "b.json", 4, rec=0.09)  # +80% reconstruction
    r = _run(a, b, tmp_path / "out.png")
    assert r.returncode == 1, r.stdout + r.stderr
    assert "FAIL" in r.stdout
