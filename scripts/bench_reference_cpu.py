"""Same-host CPU-vs-CPU ratio: reference loop iteration vs our fused step.

VERDICT r3 #6: ``bench.py``'s ``vs_baseline`` divides by a documented
ESTIMATE (20 img/s) of the reference's single-GPU throughput. This script
pins a measured lower-bound datum next to it: it runs the ACTUAL reference
step functions (``/root/reference/src/core/training.py:71-257`` — the
exact unit of work of one loop iteration, train.py:204-251) on this host's
CPU, then our fused train step on the same CPU at the same shapes
(64x64, batch 4, float32), and prints the ratio.

Caveats (documented in BASELINE.md):
- the reference's external ``ada`` augmentation package is not installed
  here; an identity stub stands in (reference starts at p=0 anyway), which
  UNDERSTATES the reference's cost -> the ratio is a lower bound;
- data loading is excluded on both sides (pre-staged tensors);
- a CPU ratio bounds relative arithmetic/step-structure cost, not the
  GPU-vs-TPU hardware comparison — it cannot replace a reference GPU run.

Usage: python scripts/bench_reference_cpu.py [steps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

IMAGE_SIZE = 64
BATCH = 4
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
REFERENCE_ROOT = "/root/reference"

CONFIG = {
    "training": {"batch_size": BATCH, "image_buffer_size": 50,
                 "style_mixing_prob": 0.9},
    "optimisation": {
        "learning_rate": 2e-3,
        "mapping_network_learning_rate": 2e-5,
        "adam_betas": (0.5, 0.99),
        "style_cycle_loss_lambda": 5.0,
        "identity_loss_lambda": 5.0,
        "reconstruction_loss_lambda": 5.0,
        "kl_loss_lambda": 0.01,
        "path_loss_lambda": 0.1,
        "path_loss_jacobian_granularity": (0.1, 0.2),
    },
    "architecture": {"w_dim": 8, "add_latent_noise": False,
                     "min_latent_resolution": 16, "n_resnet_blocks": 7,
                     "mapping_network_layers": 2},
    "ada": {"ada_overfitting_measurement_n_images": 256,
            "ada_adjustment_size": 5.12e-4,
            "discriminator_real_acc_target": 0.6},
    "data": {"image_channels": 1},
}


def time_reference() -> float:
    """Seconds per reference loop iteration (D step + G step), CPU."""
    import torch

    # identity stand-in for the absent external `ada` package (see module
    # docstring); injected BEFORE src.core.training's `from ada import ...`
    ada_mod = types.ModuleType("ada")

    class _IdentityADA(torch.nn.Module):
        def __init__(self, **kwargs):
            super().__init__()

        def forward(self, x):
            return x

    ada_mod.AdaptiveDiscriminatorAugmentation = _IdentityADA
    sys.modules.setdefault("ada", ada_mod)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    from src.core import training as ref_training
    from src.model.builder import (
        Discriminator,
        Generator,
        MappingNetwork,
        StyleExtractor,
    )
    from src.model.loss import ADAp

    torch.manual_seed(0)
    device = torch.device("cpu")
    arch = CONFIG["architecture"]
    disc = Discriminator(input_nc=1)
    gen = Generator(
        input_nc=1,
        w_dim=arch["w_dim"],
        image_size=(IMAGE_SIZE, IMAGE_SIZE),
        min_latent_resolution=arch["min_latent_resolution"],
        n_resnet_blocks=arch["n_resnet_blocks"],
    )
    mapping = MappingNetwork(
        features=arch["w_dim"], n_layers=arch["mapping_network_layers"],
        style_mixing_prob=CONFIG["training"]["style_mixing_prob"],
    )
    extractor = StyleExtractor(input_nc=1, w_dim=arch["w_dim"])

    betas = CONFIG["optimisation"]["adam_betas"]
    lr = CONFIG["optimisation"]["learning_rate"]
    opt_d = torch.optim.Adam(disc.parameters(), lr=lr, betas=betas)
    opt_g = torch.optim.Adam(gen.parameters(), lr=lr, betas=betas)
    opt_m = torch.optim.Adam(
        mapping.parameters(),
        lr=CONFIG["optimisation"]["mapping_network_learning_rate"],
        betas=betas,
    )
    opt_s = torch.optim.Adam(extractor.parameters(), lr=lr, betas=betas)

    def batches():
        while True:
            yield torch.rand(BATCH, 1, IMAGE_SIZE, IMAGE_SIZE) * 2 - 1

    prints_iter, marks_iter = batches(), batches()
    buffer = ref_training.ImageBuffer(CONFIG["training"]["image_buffer_size"])
    ada = _IdentityADA()
    ada_p = ADAp(
        ada_e=CONFIG["ada"]["ada_overfitting_measurement_n_images"],
        ada_adjustment_size=CONFIG["ada"]["ada_adjustment_size"],
        batch_size=BATCH,
        discriminator_overfitting_target=CONFIG["ada"][
            "discriminator_real_acc_target"
        ],
    )

    def one_iteration():
        ref_training.discriminator_step(
            CONFIG, device, disc, gen, mapping, opt_d,
            prints_iter, marks_iter, buffer, ada, ada_p,
        )
        ref_training.generator_step(
            CONFIG, device, gen, disc, mapping, extractor,
            opt_g, opt_m, opt_s, prints_iter, marks_iter, ada,
        )

    for _ in range(2):  # warmup
        one_iteration()
    t0 = time.perf_counter()
    for _ in range(STEPS):
        one_iteration()
    return (time.perf_counter() - t0) / STEPS


def time_ours() -> float:
    """Seconds per fused step on the same CPU, same shapes, float32."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from one_to_many_gan_tpu.core.state import Models, init_train_state
    from one_to_many_gan_tpu.core.train_step import Batches, make_train_step
    from one_to_many_gan_tpu.presets import tiny_config

    config = tiny_config(
        (IMAGE_SIZE, IMAGE_SIZE),
        BATCH,
        min_latent=CONFIG["architecture"]["min_latent_resolution"],
        w_dim=CONFIG["architecture"]["w_dim"],
        n_resnet_blocks=CONFIG["architecture"]["n_resnet_blocks"],
        buffer_size=CONFIG["training"]["image_buffer_size"],
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    step = jax.jit(make_train_step(config, models), donate_argnums=0)
    rng = np.random.default_rng(0)

    def mk():
        return jax.device_put(
            (rng.random((BATCH, IMAGE_SIZE, IMAGE_SIZE, 1)) * 2 - 1).astype(
                np.float32
            )
        )

    batches = Batches(mk(), mk(), mk(), mk())
    for i in range(2):  # warmup + compile
        state, metrics = step(state, batches, jax.random.key(i))
    float(metrics["total_gen_loss"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step(state, batches, jax.random.key(100 + i))
    float(metrics["total_gen_loss"])
    return (time.perf_counter() - t0) / STEPS


def main() -> None:
    ref_s = time_reference()
    ours_s = time_ours()
    print(
        json.dumps(
            {
                "metric": f"cpu_step_ratio_{IMAGE_SIZE}x{IMAGE_SIZE}_b{BATCH}",
                "reference_sec_per_iter": round(ref_s, 4),
                "ours_sec_per_iter": round(ours_s, 4),
                "reference_img_per_sec": round(BATCH / ref_s, 3),
                "ours_img_per_sec": round(BATCH / ours_s, 3),
                "speedup_same_cpu": round(ref_s / ours_s, 3),
                "note": "identity-ADA stub; data loading excluded; lower bound",
            }
        )
    )


if __name__ == "__main__":
    main()
