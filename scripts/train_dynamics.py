"""Training-dynamics evidence run (VERDICT r1 #6): does the system TRAIN?

Runs the production Trainer for a few thousand steps on structured
synthetic data (TPU), then asserts the dynamics the reference exhibits:

- reconstruction / identity losses FALL (the autoencoding pathway learns);
- the ADA probability RISES once D overfits (controller intent,
  reference src/model/loss.py:11-52) — driven here by a small dataset,
  which forces D memorization;
- losses stay finite throughout (no divergence);
- image-grid artifacts are written and change over checkpoints.

Writes <out>/dynamics_log.json + the standard run artifacts. Usage:
    python scripts/train_dynamics.py [steps] [size] [out_dir] [batch] [remat] [split]

``split=1`` runs the split-phase programs (tpu.split_phases with
remat_d="none") — the measured 512² operating point (BASELINE.md
round-3 results).

Env knobs: ``OTM_DYN_PATH_INTERVAL`` sets tpu.path_interval (lazy
path-length regularization; VERDICT r4 #1 asks for dynamics evidence
that interval=4 trains equivalently to interval=1 at the flagship
operating point).

At size >= 256 the generator uses the flagship min_latent_resolution=64
(the tpu_v5e8_512.toml arithmetic) so the 512² evidence run exercises
the production decoder depth.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    out = Path(sys.argv[3]) if len(sys.argv) > 3 else Path("/tmp/otm_dynamics")
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    remat = sys.argv[5] if len(sys.argv) > 5 else "none"
    split = len(sys.argv) > 6 and sys.argv[6] == "1"

    from one_to_many_gan_tpu.core.trainer import Trainer
    from one_to_many_gan_tpu.data import synthetic_images
    from one_to_many_gan_tpu.presets import tiny_config

    config = tiny_config(
        (size, size),
        batch,
        min_latent=64 if size >= 256 else size // 4,
        w_dim=6,
        training={
            "training_steps": steps,
            "image_buffer_size": 32,
            "checkpoint_directory": str(out),
            "training_run": "dynamics",
        },
        ada={
            # small window so p reacts within the run
            "ada_overfitting_measurement_n_images": 256,
            "ada_adjustment_size": 5.12e-4 * 4,
        },
        evaluation={
            "log_interval": 100,
            "checkpoint_interval": max(500, steps // 4),
            "n_evaluation_images": 16,
            "inference_batch_size": 8,
        },
        tpu={
            "precision": "bfloat16",
            "steps_per_call": 100 if size < 256 else 10,
            "ema_decay": 0.999,
            "resume": False,
            "remat": remat,
            "remat_d": "none" if split else "same",
            "split_phases": split,
            "ada_pallas": True,
            "path_interval": int(os.environ.get("OTM_DYN_PATH_INTERVAL", "1")),
        },
    )

    # Small structured dataset (64 images/domain): D can memorize it, which
    # is exactly the overfitting regime the ADA controller exists for.
    n_data = 64 if size < 256 else 32
    prints = synthetic_images(n_data, (size, size), seed=0)
    marks = synthetic_images(n_data, (size, size), seed=777)

    trainer = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=True
    )

    # capture the per-interval means by tapping the Logger's summary
    history: list[dict] = []
    orig_summary = trainer.logger.summary

    def tapping_summary(step):
        line, means = orig_summary(step)
        history.append({"step": step, **means})
        return line, means

    trainer.logger.summary = tapping_summary

    t0 = time.perf_counter()
    trainer.run()
    wall = time.perf_counter() - t0

    out.mkdir(parents=True, exist_ok=True)
    payload = {
        "steps": steps,
        "size": size,
        "batch": batch,
        "split_phases": split,
        "path_interval": config["tpu"]["path_interval"],
        "wall_s": round(wall, 1),
        "images_per_sec": round(steps * batch / wall, 2),
        "history": history,
    }
    (out / "dynamics_log.json").write_text(json.dumps(payload, indent=1))

    # ----------------------------------------------------------- assertions
    first, last = history[0], history[-1]
    q = history[: max(1, len(history) // 4)]  # first quarter
    early_rec = float(np.mean([h["rec_losses"] for h in q]))
    late_rec = float(np.mean([h["rec_losses"] for h in history[-len(q):]]))
    early_idt = float(np.mean([h["idt_losses"] for h in q]))
    late_idt = float(np.mean([h["idt_losses"] for h in history[-len(q):]]))

    print(f"\nwall {wall:.0f}s  ({payload['images_per_sec']} img/s)")
    print(f"rec  {early_rec:.4f} -> {late_rec:.4f}")
    print(f"idt  {early_idt:.4f} -> {late_idt:.4f}")
    print(f"ada_p {first['ada_ps']:.4f} -> {last['ada_ps']:.4f}")
    print(f"d_real_acc last {last['disc_real_accs']:.3f}")

    ok = True
    for name, val in (("rec", late_rec < 0.7 * early_rec),
                      ("idt", late_idt < 0.7 * early_idt),
                      ("ada_p_rises", last["ada_ps"] > 0.02),
                      ("finite", all(np.isfinite(v) for h in history
                                     for v in h.values()))):
        print(f"  {name}: {'OK' if val else 'FAIL'}")
        ok &= bool(val)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
