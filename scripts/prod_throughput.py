"""Production-loop TPU throughput (VERDICT r1 #4).

Measures ``Trainer.run()`` — the REAL loop with Logger, prefetch thread,
K-step scan, and file logging — for >=500 steps at the bench operating
point (256x256, bf16, batch 16), so the number is directly comparable to
bench.py's fused-step figure. No checkpoint cycle inside the timed window
(ckpt cadence is the same as the reference default: every 5000 steps).

Usage: python scripts/prod_throughput.py [steps] [batch] [size]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from one_to_many_gan_tpu.core.trainer import Trainer
    from one_to_many_gan_tpu.data import synthetic_images
    from one_to_many_gan_tpu.presets import tiny_config

    remat = sys.argv[4] if len(sys.argv) > 4 else "none"
    config = tiny_config(
        (size, size),
        batch,
        min_latent=64,
        training={
            # far above the measured window so run(max_steps=...) never hits
            # the unconditional step==total checkpoint inside the timing
            "training_steps": 100_000,
            "checkpoint_directory": "/tmp/otm_prod",
            "training_run": "prod_throughput",
        },
        evaluation={
            "log_interval": 100,
            "checkpoint_interval": 5000,  # reference cadence; outside window
        },
        tpu={
            "precision": "bfloat16",
            "steps_per_call": 50,
            "resume": False,
            "remat": remat,
            # production single-chip operating point includes the fused
            # Pallas warp (bench.py default; +3% measured)
            "ada_pallas": True,
        },
    )

    prints = synthetic_images(256, (size, size), seed=0)
    marks = synthetic_images(256, (size, size), seed=1)
    trainer = Trainer(config, shoeprint_images=prints, shoemark_images=marks)

    # Warm up: compile + first call outside the timed window.
    trainer.run(max_steps=50)
    trainer.start_step = 50
    t0 = time.perf_counter()
    trainer.run(max_steps=steps - 50)
    wall = time.perf_counter() - t0
    timed_steps = steps - 50
    ips = timed_steps * batch / wall
    print(
        json.dumps(
            {
                "metric": "prod_loop_images_per_sec_per_chip",
                "value": round(ips, 2),
                "unit": "img/s",
                "steps": timed_steps,
                "batch": batch,
                "size": size,
                "wall_s": round(wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
