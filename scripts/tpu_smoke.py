"""TPU end-to-end smoke: the PRODUCTION Trainer path on real hardware.

Synthetic data, 256x256 bf16 batch 16, a few dozen steps with one full
checkpoint cycle (grids + FID/KID + Orbax save), then a resume check.
Proves the whole stack — not just the benchmarked step — runs on TPU.
"""

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from one_to_many_gan_tpu.core.trainer import Trainer  # noqa: E402
from one_to_many_gan_tpu.data import synthetic_images  # noqa: E402
from one_to_many_gan_tpu.presets import tiny_config  # noqa: E402


def main():
    root = Path("/tmp/otm_tpu_smoke")
    shutil.rmtree(root, ignore_errors=True)
    config = tiny_config(
        (256, 256), 16, min_latent=64, root=str(root),
        tpu={"precision": "bfloat16", "steps_per_call": 10},
    )
    config["training"]["training_steps"] = 40
    config["evaluation"]["log_interval"] = 20
    config["evaluation"]["checkpoint_interval"] = 40
    config["evaluation"]["n_evaluation_images"] = 32
    config["evaluation"]["inference_batch_size"] = 16

    prints = synthetic_images(64, (256, 256), seed=0)
    marks = synthetic_images(64, (256, 256), seed=1)

    t0 = time.perf_counter()
    trainer = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=True
    )
    state = trainer.run()
    print(f"trained to step {int(state.step)} in {time.perf_counter()-t0:.1f}s")

    run_dir = root / "preset"
    assert (run_dir / "log").exists()
    assert (run_dir / "images" / "translation_40.png").exists()
    assert len(list((run_dir / "val").glob("*.png"))) == 32

    # resume check
    trainer2 = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=True
    )
    assert trainer2.start_step == 40, trainer2.start_step
    print("TPU smoke OK: trained, checkpointed, grids+FID written, resume works")


if __name__ == "__main__":
    main()
