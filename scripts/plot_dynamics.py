"""Render dynamics_log.json (scripts/train_dynamics.py) to a PNG figure.

Produces the committed training-dynamics evidence: loss trajectories, the
ADA probability trajectory, and D accuracy over a multi-thousand-step TPU
run. Usage: python scripts/plot_dynamics.py <dynamics_log.json> <out.png>
"""

import json
import sys
from pathlib import Path


def main() -> None:
    log_path = Path(sys.argv[1])
    out_path = Path(sys.argv[2])
    payload = json.loads(log_path.read_text())
    hist = payload["history"]
    steps = [h["step"] for h in hist]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))

    ax = axes[0]
    for key, label in (
        ("rec_losses", "reconstruction"),
        ("idt_losses", "identity"),
        ("style_losses", "style cycle"),
        ("path_losses", "path"),
    ):
        ax.plot(steps, [h[key] for h in hist], label=label)
    ax.set_yscale("log")
    ax.set_xlabel("step")
    ax.set_title("generator losses (log scale)")
    ax.legend()

    ax = axes[1]
    ax.plot(steps, [h["ada_ps"] for h in hist], color="tab:red")
    ax.set_xlabel("step")
    ax.set_title("ADA probability p (controller output)")

    ax = axes[2]
    ax.plot(steps, [h["disc_real_accs"] for h in hist], label="D real acc")
    ax.plot(steps, [h["disc_fake_accs"] for h in hist], label="D fake acc")
    ax.axhline(0.6, ls="--", c="gray", lw=0.8, label="ADA target 0.6")
    ax.set_xlabel("step")
    ax.set_title("discriminator sign-confidence")
    ax.legend()

    meta = (
        f"{payload['steps']} steps @ {payload['size']}^2, "
        f"{payload['images_per_sec']} img/s (TPU v5e)"
    )
    fig.suptitle(f"Training dynamics — {meta}")
    fig.tight_layout()
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=120)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
