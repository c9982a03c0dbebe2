"""Compare two dynamics runs (lazy-path equivalence evidence, VERDICT r4 #1c).

Renders a side-by-side figure and prints a JSON verdict comparing the
trajectories of two scripts/train_dynamics.py logs — intended for the
flagship 256² b16 run at tpu.path_interval=1 vs =4: equivalently-trained
runs show the same rec/idt descent, the same ADA-p behavior, and a
comparable raw path-loss LEVEL (the lazy run's logged per-interval mean
includes skipped-step zeros, so it is rescaled by the interval before
comparison).

Usage: python scripts/compare_dynamics.py a.json b.json out.png
"""

import json
import sys
from pathlib import Path

import numpy as np


def _late_mean(hist, key, frac=0.25):
    n = max(1, int(len(hist) * frac))
    return float(np.mean([h[key] for h in hist[-n:]]))


def main() -> None:
    a_path, b_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    a = json.loads(Path(a_path).read_text())
    b = json.loads(Path(b_path).read_text())
    ha, hb = a["history"], b["history"]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    la = f"path_interval={a.get('path_interval', 1)}"
    lb = f"path_interval={b.get('path_interval', 1)}"
    fig, axes = plt.subplots(1, 4, figsize=(20, 4))
    for ax, key, title, logy in (
        (axes[0], "rec_losses", "reconstruction loss", True),
        (axes[1], "idt_losses", "identity loss", True),
        (axes[2], "ada_ps", "ADA probability p", False),
    ):
        ax.plot([h["step"] for h in ha], [h[key] for h in ha], label=la)
        ax.plot([h["step"] for h in hb], [h[key] for h in hb], label=lb)
        if logy:
            ax.set_yscale("log")
        ax.set_title(title)
        ax.set_xlabel("step")
        ax.legend()
    # path loss: rescale each run's logged mean by its interval (off-step
    # zeros dilute the mean by exactly 1/interval)
    ax = axes[3]
    for payload, hist, label in ((a, ha, la), (b, hb, lb)):
        k = payload.get("path_interval", 1)
        ax.plot([h["step"] for h in hist],
                [h["path_losses"] * k for h in hist], label=label)
    ax.set_yscale("log")
    ax.set_title("path loss (interval-rescaled)")
    ax.set_xlabel("step")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)

    ka, kb = a.get("path_interval", 1), b.get("path_interval", 1)
    verdict = {
        "a": {"file": a_path, "path_interval": ka,
              "img_per_sec": a.get("images_per_sec")},
        "b": {"file": b_path, "path_interval": kb,
              "img_per_sec": b.get("images_per_sec")},
        "late_rec": [_late_mean(ha, "rec_losses"), _late_mean(hb, "rec_losses")],
        "late_idt": [_late_mean(ha, "idt_losses"), _late_mean(hb, "idt_losses")],
        "late_ada_p": [_late_mean(ha, "ada_ps"), _late_mean(hb, "ada_ps")],
        "late_path_rescaled": [ka * _late_mean(ha, "path_losses"),
                               kb * _late_mean(hb, "path_losses")],
    }
    # equivalence bands: GAN runs are stochastic; same-order descent and
    # same controller regime is the claim, not bitwise trajectories
    checks = {}
    for key, tol in (("late_rec", 0.35), ("late_idt", 0.35),
                     ("late_path_rescaled", 0.6)):
        x, y = verdict[key]
        checks[key] = abs(x - y) <= tol * max(abs(x), abs(y), 1e-9)
    pa, pb = verdict["late_ada_p"]
    checks["ada_p_same_regime"] = (pa > 0.02) == (pb > 0.02)
    verdict["checks"] = checks
    verdict["equivalent"] = all(checks.values())
    print(json.dumps(verdict, indent=1))


if __name__ == "__main__":
    main()
