"""Deployment artifact export: EMA generator + mapping network only.

A full training checkpoint (Orbax) holds four models, four optimizer
states, the ADA controller and the replay buffer — most of which serving
never touches. This exports ONLY what 1->N inference needs (the EMA
generator when enabled, plus the mapping network) into one compressed
``.npz`` that `serve.py --artifact` / `InferenceEngine(artifact=...)`
loads without the Orbax machinery — typically 4-8x smaller than the
checkpoint directory and trivially copyable to a serving fleet.

The reference has no deployment story (its checkpoints are monolithic
torch.save .tar files that are never loaded; reference
src/core/evaluation.py:227-263).

CLI:
    python -m one_to_many_gan_tpu.export config.toml --out model.npz
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

_PREFIXES = ("g", "m")


def _flatten(tree, prefix: str, out: dict) -> None:
    from collections.abc import Mapping

    if isinstance(tree, Mapping):
        for key, sub in tree.items():
            assert "/" not in key, f"param name {key!r} contains '/'"
            _flatten(sub, f"{prefix}/{key}", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: dict, prefix: str):
    root: dict = {}
    for full_key, value in flat.items():
        parts = full_key.split("/")
        if parts[0] != prefix:
            continue
        node = root
        for part in parts[1:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return root


def export_inference_artifact(config, out_path: Path | str) -> Path:
    """Restore the latest checkpoint of the configured run and write the
    inference-only artifact. Returns the written path."""
    import jax

    from one_to_many_gan_tpu.core.state import (
        Models,
        eval_params_g,
        init_train_state,
    )
    from one_to_many_gan_tpu.core.trainer import (
        _checkpoint_manager,
        restore_checkpoint,
    )

    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    state, step = restore_checkpoint(_checkpoint_manager(config), state)

    flat: dict = {}
    _flatten(jax.tree.map(np.asarray, eval_params_g(state)), "g", flat)
    _flatten(jax.tree.map(np.asarray, state.params_m), "m", flat)
    flat["__step__"] = np.int64(step)
    flat["__ema__"] = np.bool_(state.ema_params_g is not None)

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_path, **flat)
    return out_path


def load_inference_artifact(path: Path | str):
    """-> (params_g, params_m, step, ema). Inverse of the export."""
    with np.load(Path(path)) as z:
        flat = {k: z[k] for k in z.files}
    step = int(flat.pop("__step__"))
    ema = bool(flat.pop("__ema__"))
    return _unflatten(flat, "g"), _unflatten(flat, "m"), step, ema


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--out", default="model.npz")
    args = ap.parse_args()

    from one_to_many_gan_tpu.config import load_config

    path = export_inference_artifact(load_config(args.config), args.out)
    size_mb = path.stat().st_size / 1e6
    print(f"wrote {path} ({size_mb:.1f} MB)")


if __name__ == "__main__":
    main()
