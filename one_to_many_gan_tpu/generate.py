"""1->N inference CLI: one shoeprint -> N style-conditioned shoemarks.

    python -m one_to_many_gan_tpu.generate config.toml \
        --source path/to/shoeprint.png --n 64 --out out_dir [--seed 0] [--theta 1.0]

Loads the latest Orbax checkpoint of the configured run (EMA generator
params when EMA was enabled), encodes the source once, and decodes all N
styles in a single batched XLA call (the reference only exposes this
pattern implicitly inside image_checkpoint, evaluation.py:171-177).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def generate(
    config_path: str,
    source: str,
    n: int,
    out_dir: str,
    seed: int = 0,
    theta: float = 1.0,
    artifact: str | None = None,
    int8: bool = False,
) -> list[Path]:
    import jax

    from one_to_many_gan_tpu.config import load_config
    from one_to_many_gan_tpu.core.state import Models, init_train_state
    from one_to_many_gan_tpu.core.train_step import make_inference_fns
    from one_to_many_gan_tpu.core.trainer import _checkpoint_manager, restore_checkpoint
    from one_to_many_gan_tpu.data.datasets import _load_image
    from one_to_many_gan_tpu.data.pipeline import normalize_u8
    from PIL import Image

    config = load_config(config_path)
    # int8: decoder convs quantized at apply time (ops/quantize.py) —
    # identical param tree, so the same checkpoint/artifact loads
    models = Models(config, int8_decode=int8)
    if artifact is not None:
        # same deployment artifact serve.py --artifact consumes (export.py)
        from one_to_many_gan_tpu.export import load_inference_artifact

        params_g, params_m, step, _ema = load_inference_artifact(artifact)
        print(f"loaded inference artifact at step {step}")
    else:
        state = init_train_state(config, models, jax.random.key(seed))
        mgr = _checkpoint_manager(config)
        state, step = restore_checkpoint(mgr, state)
        if step == 0:
            print("warning: no checkpoint found; generating with fresh weights")
        params_g = (
            state.ema_params_g if state.ema_params_g is not None else state.params_g
        )
        params_m = state.params_m

    img_u8 = _load_image(
        Path(source),
        tuple(config["data"]["image_size"]),
        config["data"]["image_channels"],
    )
    img = normalize_u8(img_u8[None])[0]

    _, one_to_many, _ = make_inference_fns(config, models)
    outs = np.asarray(
        jax.jit(one_to_many, static_argnums=4)(
            params_g, params_m, img, jax.random.key(seed), n, theta
        )
    )

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = []
    for i, arr in enumerate(np.clip((outs + 1.0) * 127.5, 0, 255).astype(np.uint8)):
        p = out / f"shoemark_{i:04d}.png"
        Image.fromarray(arr.squeeze(-1) if arr.shape[-1] == 1 else arr).save(p)
        paths.append(p)
    print(f"wrote {len(paths)} images to {out}")
    return paths


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--source", required=True)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--out", default="generated")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--theta", type=float, default=1.0)
    ap.add_argument(
        "--artifact",
        default=None,
        help="generate from an export.py inference artifact (npz) instead "
        "of the latest Orbax checkpoint",
    )
    ap.add_argument(
        "--int8",
        action="store_true",
        help="int8 decoder convs; measured ~1.03x at 256^2 b16 (decode is "
        "bandwidth-bound there, BASELINE.md) — opt-in for MXU-bound shapes",
    )
    args = ap.parse_args()
    generate(args.config, args.source, args.n, args.out, args.seed, args.theta,
             artifact=args.artifact, int8=args.int8)


if __name__ == "__main__":
    main()
