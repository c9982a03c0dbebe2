"""Overlay two train_dynamics.py runs: lazy-path equivalence evidence.

VERDICT r4 #1(c): show that ``tpu.path_interval=N`` trains equivalently to
the reference-exact interval=1 at the flagship operating point. Both runs
consume IDENTICAL random streams (the lax.cond branches trace the same key
plumbing, and the data order is seeded), so any trajectory difference is
attributable to the lazy path-gradient schedule alone.

Usage:
    python scripts/compare_dynamics.py anchor_log.json lazy_log.json out.png \
        [anchor_run.log lazy_run.log]

The optional text logs are scanned for ``Step N | fid: ...`` validation
lines (random-projection FID trend). Prints final-quarter trajectory means
for both runs with relative deltas and exits 1 if the equivalence bounds
fail (rec/idt/style within 20%, ada_p within 0.1 absolute, all finite).

Note on the path series: off-interval steps log path_loss = 0 (the cond's
off branch never computes it), so the lazy run's interval MEANS sit at
~raw/N; the plot and the table rescale by N to compare raw on-step levels.
"""

import json
import re
import sys
from pathlib import Path

import numpy as np


def load(path):
    p = json.loads(Path(path).read_text())
    return p, p["history"]


def fid_trend(log_path):
    rx = re.compile(r"Step (\d+) \| fid: ([0-9.eE+-]+)")
    out = []
    for line in Path(log_path).read_text().splitlines():
        m = rx.search(line)
        if m:
            out.append((int(m.group(1)), float(m.group(2))))
    return out


def q4(hist, key, scale=1.0):
    vals = [h[key] * scale for h in hist]
    n = max(1, len(vals) // 4)
    return float(np.mean(vals[-n:]))


def main():
    a_path, l_path, out_png = sys.argv[1], sys.argv[2], sys.argv[3]
    pa, ha = load(a_path)
    pl, hl = load(l_path)
    interval = pl["path_interval"]
    assert pa["path_interval"] == 1, "first arg must be the interval=1 anchor"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps_a = [h["step"] for h in ha]
    steps_l = [h["step"] for h in hl]
    fig, axes = plt.subplots(1, 4, figsize=(20, 4))

    ax = axes[0]
    for key, label in (("rec_losses", "rec"), ("idt_losses", "idt"),
                       ("style_losses", "style")):
        ax.plot(steps_a, [h[key] for h in ha], label=f"{label} interval=1")
        ax.plot(steps_l, [h[key] for h in hl], "--",
                label=f"{label} interval={interval}")
    ax.set_yscale("log")
    ax.set_xlabel("step")
    ax.set_title("generator losses (log scale)")
    ax.legend(fontsize=7)

    ax = axes[1]
    ax.plot(steps_a, [h["ada_ps"] for h in ha], label="interval=1")
    ax.plot(steps_l, [h["ada_ps"] for h in hl], "--",
            label=f"interval={interval}")
    ax.set_xlabel("step")
    ax.set_title("ADA probability p")
    ax.legend()

    ax = axes[2]
    ax.plot(steps_a, [h["disc_real_accs"] for h in ha], label="real i=1")
    ax.plot(steps_l, [h["disc_real_accs"] for h in hl], "--",
            label=f"real i={interval}")
    ax.plot(steps_a, [h["disc_fake_accs"] for h in ha], label="fake i=1")
    ax.plot(steps_l, [h["disc_fake_accs"] for h in hl], "--",
            label=f"fake i={interval}")
    ax.axhline(0.6, ls=":", c="gray", lw=0.8)
    ax.set_xlabel("step")
    ax.set_title("D sign-confidence")
    ax.legend(fontsize=7)

    ax = axes[3]
    ax.plot(steps_a, [h["path_losses"] for h in ha], label="interval=1 (raw)")
    ax.plot(steps_l, [h["path_losses"] * interval for h in hl], "--",
            label=f"interval={interval} (mean x {interval})")
    ax.set_xlabel("step")
    ax.set_title("path-length loss (on-step level)")
    ax.legend(fontsize=7)

    meta = (f"{pa['steps']} steps @ {pa['size']}^2 b{pa['batch']} — "
            f"lazy path interval {interval} vs 1 (identical RNG/data streams)")
    fig.suptitle(f"Lazy path-length regularization equivalence — {meta}")
    fig.tight_layout()
    Path(out_png).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_png, dpi=120)
    print(f"wrote {out_png}")

    rows = [
        ("rec", q4(ha, "rec_losses"), q4(hl, "rec_losses"), 0.20),
        ("idt", q4(ha, "idt_losses"), q4(hl, "idt_losses"), 0.20),
        ("style", q4(ha, "style_losses"), q4(hl, "style_losses"), 0.20),
        ("kl", q4(ha, "kl_losses"), q4(hl, "kl_losses"), 0.25),
        ("path(raw)", q4(ha, "path_losses"),
         q4(hl, "path_losses", scale=interval), 0.25),
    ]
    ok = True
    print(f"\nfinal-quarter means (interval=1 vs interval={interval}):")
    for name, a, b, tol in rows:
        rel = abs(b - a) / max(abs(a), 1e-9)
        good = rel <= tol
        ok &= good
        print(f"  {name:10s} {a:.4f} vs {b:.4f}  rel {rel:+.1%}  "
              f"(tol {tol:.0%}) {'OK' if good else 'FAIL'}")
    pa_end, pl_end = ha[-1]["ada_ps"], hl[-1]["ada_ps"]
    good_p = abs(pa_end - pl_end) <= 0.1
    ok &= good_p
    print(f"  {'ada_p end':10s} {pa_end:.4f} vs {pl_end:.4f}  "
          f"abs {abs(pa_end - pl_end):.4f} (tol 0.10) "
          f"{'OK' if good_p else 'FAIL'}")
    finite = all(np.isfinite(v) for h in ha + hl for v in h.values())
    ok &= finite
    print(f"  finite: {'OK' if finite else 'FAIL'}")

    if len(sys.argv) > 5:
        fa, fl = fid_trend(sys.argv[4]), fid_trend(sys.argv[5])
        print("\nrp-FID trend (random_projection_v1, relative-only):")
        print(f"  interval=1        : {fa}")
        print(f"  interval={interval:<9d}: {fl}")

    print(f"\nthroughput (wall incl. compile + eval cycles): "
          f"{pa['images_per_sec']} vs {pl['images_per_sec']} img/s")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
