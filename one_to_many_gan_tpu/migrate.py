"""Import a reference torch checkpoint into this framework.

The reference persists training state as one torch.save'd dict
(/root/reference/src/core/evaluation.py:240-263): the four models'
``state_dict()``s, their four Adam optimiser ``state_dict()``s, the ADA
probability, and the image buffer. This module maps that file into this
framework's :class:`TrainState` by KEY AND SHAPE ARITHMETIC ONLY — it
never imports reference code (the checkpoint file format, like the TOML
schema, is the reference's public data contract) — and writes a native
Orbax checkpoint. A run trained on the reference (torch/GPU) can then
continue training, serve, or evaluate on TPU *mid-flight*:

    python -m one_to_many_gan_tpu.migrate config.toml /runs/prints/models/1000.tar
    python train.py config.toml        # resumes at step 1000 (tpu.resume)

Mapping notes
- Equalized layers store RAW weights on both sides (the He constant is
  applied at use time on both, ops/equalized.py vs reference
  layers.py:12-43), so values copy verbatim modulo layout: linear
  [out, in] -> [in, out], conv OIHW -> HWIO.
- The blur kernels (``smooth.kernel`` keys) are fixed binomial filters,
  recomputed here (ops/resample.py) — skipped, not copied.
- Adam moments are elementwise, so they transpose exactly like their
  parameters, and torch's per-parameter ``step`` equals optax's single
  ``ScaleByAdamState.count`` (identical betas/eps/bias correction:
  reference train.py:94-116 vs core/state.py make_optimizers). Importing
  them makes this a TRUE mid-flight resume, not a weight-only warm
  start. torch keys optimiser state by positional parameter id; the
  position<->name pairing is reconstructed from state_dict order (equal
  to ``parameters()`` order with buffers filtered out) and every moment
  is shape-checked against its parameter before use.
- The reference has no EMA; ``ema_params_g`` starts as a copy of the
  imported generator params — exactly what a fresh Trainer does at
  step 0 — and converges to the EMA within ~1/(1-decay) steps.
- The reference's ADA controller saves only ``p`` (its open window of
  real-sign scores is discarded on save, loss.py:11-52); the imported
  AdaState starts a fresh window at the same ``p``.
- The image buffer (a host list of [1,C,H,W] tensors, training.py:22-65)
  becomes the device-resident [size,H,W,C] ring (core/buffer.py), padded
  with zeros past ``count``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from one_to_many_gan_tpu.config import Config, load_config
from one_to_many_gan_tpu.core.state import Models, TrainState, init_train_state
from one_to_many_gan_tpu.models.generator import generator_arithmetic

Getter = Callable[[str], np.ndarray]


class MigrationError(ValueError):
    """A reference checkpoint did not match the configured architecture."""


# --------------------------------------------------------- leaf transforms


def _lin(get: Getter, prefix: str) -> dict:
    """Reference EqualisedLinear (layers.py:27-43): weight [out,in] ->
    ours [in,out]; bias verbatim."""
    return {
        "weight": np.ascontiguousarray(get(f"{prefix}.weight.weight").T),
        "bias": get(f"{prefix}.bias"),
    }


def _conv(get: Getter, prefix: str, *, bias: bool = True) -> dict:
    """Reference EqualisedConv2d (layers.py:46-108): OIHW -> HWIO."""
    p = {
        "weight": np.ascontiguousarray(
            get(f"{prefix}.weight.weight").transpose(2, 3, 1, 0)
        )
    }
    if bias:
        p["bias"] = get(f"{prefix}.bias")
    return p


def _modconv(get: Getter, prefix: str) -> dict:
    """Reference Conv2dWeightModulate (layers.py:111-188)."""
    return {
        "weight": np.ascontiguousarray(
            get(f"{prefix}.weight.weight").transpose(2, 3, 1, 0)
        ),
        "to_style": _lin(get, f"{prefix}.to_style"),
    }


# ------------------------------------------------- per-model tree builders
#
# Index arithmetic mirrors the reference's Sequential layouts
# (builder.py:138-320). Encoder: [pad, stem, IN, ReLU] then n_down x
# [conv, IN, ReLU, DownSample] then n_enc resnet blocks. Decoder: n_dec
# modulated blocks, then n_down x [UpSample, modconv, ReLU], then
# [pad, out conv, tanh].


def map_generator_params(
    get: Getter,
    image_size: tuple[int, int],
    min_latent_resolution: int,
    n_resnet_blocks: int,
) -> dict:
    n_down, n_enc, n_dec, _ = generator_arithmetic(
        image_size, min_latent_resolution, n_resnet_blocks
    )
    params: dict = {"enc_stem": _conv(get, "encoder.1")}
    for i in range(n_down):
        params[f"enc_down_{i}"] = _conv(get, f"encoder.{4 + 4 * i}")
    for i in range(n_enc):
        base = f"encoder.{4 + 4 * n_down + i}.conv_block"
        params[f"enc_blocks_{i}"] = {
            "EqualizedConv_0": _conv(get, f"{base}.1", bias=False),
            "EqualizedConv_1": _conv(get, f"{base}.5", bias=False),
        }
    for i in range(n_dec):
        base = f"decoder.{i}.conv_block"
        params[f"dec_blocks_{i}"] = {
            "ModulatedConv_0": _modconv(get, f"{base}.1"),
            "ModulatedConv_1": _modconv(get, f"{base}.4"),
        }
    for i in range(n_down):
        params[f"dec_up_{i}"] = _modconv(get, f"decoder.{n_dec + 3 * i + 1}")
    params["out_conv"] = _conv(get, f"decoder.{n_dec + 3 * n_down + 1}")
    return {"params": params}


# The discriminator/extractor trunks are architecture-fixed
# (builder.py:259-320): convs at Sequential indices 0,3,7,11, then the
# D head conv at 14 / the S head linear at 16.
_TRUNK_IDX = (0, 3, 7, 11)


def map_discriminator_params(get: Getter) -> dict:
    p = {f"EqualizedConv_{i}": _conv(get, f"model.{k}") for i, k in enumerate(_TRUNK_IDX)}
    p["EqualizedConv_4"] = _conv(get, "model.14")
    return {"params": p}


def map_extractor_params(get: Getter) -> dict:
    p = {f"EqualizedConv_{i}": _conv(get, f"model.{k}") for i, k in enumerate(_TRUNK_IDX)}
    p["EqualizedLinear_0"] = _lin(get, "model.16")
    return {"params": p}


def map_mapping_params(get: Getter, n_layers: int) -> dict:
    return {
        "params": {
            f"EqualizedLinear_{i}": _lin(get, f"net.{2 * i}") for i in range(n_layers)
        }
    }


# ----------------------------------------------------------- state_dict IO


def _sd_getter(sd: dict) -> Getter:
    def get(key: str) -> np.ndarray:
        if key not in sd:
            msg = (
                f"checkpoint is missing '{key}' — the configured architecture "
                "does not match the checkpoint (check image_size, "
                "min_latent_resolution, n_resnet_blocks, mapping_network_layers)"
            )
            raise MigrationError(msg)
        return np.asarray(sd[key].detach().cpu().numpy(), np.float32)

    return get


def _param_keys(sd: dict) -> list[str]:
    """state_dict keys that are PARAMETERS, in ``parameters()`` order.

    state_dict and ``parameters()`` both traverse the module tree in
    registration order (parameters before submodules), so filtering the
    only buffers these models register (the fixed blur ``smooth.kernel``
    tensors) leaves the optimiser's positional parameter order.
    """
    return [k for k in sd if not k.endswith("smooth.kernel")]


def _moment_getter(sd: dict, opt_sd: dict, field: str) -> Getter:
    """Getter over Adam moments addressed by PARAMETER NAME.

    torch keys moments by positional parameter id; reconstruct the pairing
    from ``_param_keys`` order and shape-check every tensor against its
    parameter. Parameters the optimiser never stepped (empty state) read
    as zero moments — the same thing optax starts from.
    """
    keys = _param_keys(sd)
    ids = list(opt_sd["param_groups"][0]["params"])
    if len(ids) != len(keys):
        msg = (
            f"optimiser state has {len(ids)} parameters but the model "
            f"state_dict has {len(keys)} — not a matching checkpoint"
        )
        raise MigrationError(msg)
    by_name = dict(zip(keys, ids, strict=True))
    state = opt_sd["state"]

    def get(key: str) -> np.ndarray:
        pid = by_name[key]
        if pid not in state:
            return np.zeros(tuple(sd[key].shape), np.float32)
        t = state[pid][field]
        if tuple(t.shape) != tuple(sd[key].shape):
            msg = (
                f"optimiser moment for '{key}' has shape {tuple(t.shape)} "
                f"!= parameter shape {tuple(sd[key].shape)}: positional "
                "parameter pairing failed"
            )
            raise MigrationError(msg)
        return np.asarray(t.detach().cpu().numpy(), np.float32)

    return get


def _opt_count(opt_sd: dict) -> int:
    steps = [int(v["step"]) for v in opt_sd["state"].values()]
    return max(steps) if steps else 0


def _adam_state(template, sd: dict, opt_sd: dict, build: Callable[[Getter], dict]):
    """Rebuild one optax.adam state from a torch Adam state_dict.

    ``build`` is the same tree builder used for the parameters, called
    with moment getters — so moments get the identical layout transposes.
    ``template`` (from ``optax.adam(...).init``) supplies the state
    structure: ``(ScaleByAdamState, EmptyState)``.
    """
    mu = build(_moment_getter(sd, opt_sd, "exp_avg"))
    nu = build(_moment_getter(sd, opt_sd, "exp_avg_sq"))
    adam_tpl = template[0]
    return (
        adam_tpl._replace(
            count=jnp.asarray(_opt_count(opt_sd), adam_tpl.count.dtype),
            mu=jax.tree.map(jnp.asarray, mu),
            nu=jax.tree.map(jnp.asarray, nu),
        ),
        *template[1:],
    )


def _check_tree(name: str, mapped, template) -> None:
    """Loud structural/shape validation before any value is used."""
    ms = jax.tree_util.tree_structure(mapped)
    ts = jax.tree_util.tree_structure(template)
    if ms != ts:
        msg = f"{name}: mapped tree structure does not match the model:\n{ms}\nvs\n{ts}"
        raise MigrationError(msg)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(mapped)[0],
        jax.tree_util.tree_leaves(template),
        strict=True,
    ):
        if np.shape(a) != np.shape(b):
            msg = (
                f"{name}: leaf {jax.tree_util.keystr(path)} has shape "
                f"{np.shape(a)} but the configured model expects {np.shape(b)}"
            )
            raise MigrationError(msg)


# ------------------------------------------------------------------ import


def import_torch_checkpoint(
    config: Config,
    tar_path: str | Path,
    *,
    import_optimizer: bool = True,
    rng_seed: int = 0,
) -> tuple[TrainState, int]:
    """Load a reference ``<step>.tar`` into a TrainState at that step.

    Returns ``(state, step)`` with params/EMA/Adam moments/ADA p/image
    buffer carried over (module docstring). ``import_optimizer=False``
    resets the Adam moments instead (weight-only warm start).
    """
    import torch

    tar_path = Path(tar_path)
    try:
        step = int(tar_path.stem)
    except ValueError as e:
        msg = (
            f"cannot infer the step from '{tar_path.name}': the reference "
            "names checkpoints '<step>.tar' (evaluation.py:263)"
        )
        raise MigrationError(msg) from e
    ckpt = torch.load(tar_path, map_location="cpu", weights_only=True)

    arch = config["architecture"]
    image_size = tuple(config["data"]["image_size"])
    models = Models(config)
    template = init_train_state(config, models, jax.random.key(rng_seed))

    sd_g = ckpt["generator_state_dict"]
    sd_d = ckpt["discriminator_state_dict"]
    sd_m = ckpt["mapping_network_state_dict"]
    sd_s = ckpt["style_extractor_state_dict"]

    def build_g(get: Getter) -> dict:
        return map_generator_params(
            get, image_size, arch["min_latent_resolution"], arch["n_resnet_blocks"]
        )

    def build_d(get: Getter) -> dict:
        return map_discriminator_params(get)

    def build_m(get: Getter) -> dict:
        return map_mapping_params(get, arch["mapping_network_layers"])

    def build_s(get: Getter) -> dict:
        return map_extractor_params(get)

    mapped = {}
    for name, sd, build, tpl in (
        ("generator", sd_g, build_g, template.params_g),
        ("discriminator", sd_d, build_d, template.params_d),
        ("mapping_network", sd_m, build_m, template.params_m),
        ("style_extractor", sd_s, build_s, template.params_s),
    ):
        tree = build(_sd_getter(sd))
        _check_tree(name, tree, tpl)
        consumed = len(jax.tree_util.tree_leaves(tree))
        available = len(_param_keys(sd))
        if consumed != available:
            msg = (
                f"{name}: mapped {consumed} parameters but the checkpoint "
                f"holds {available} — unmapped parameters would be silently "
                "dropped (architecture drift?)"
            )
            raise MigrationError(msg)
        mapped[name] = jax.tree.map(jnp.asarray, tree)

    opts = {}
    for key, sd, build, tpl in (
        ("opt_g", sd_g, build_g, template.opt_g),
        ("opt_d", sd_d, build_d, template.opt_d),
        ("opt_m", sd_m, build_m, template.opt_m),
        ("opt_s", sd_s, build_s, template.opt_s),
    ):
        if import_optimizer:
            torch_key = {
                "opt_g": "generator_optim_state_dict",
                "opt_d": "discriminator_optim_state_dict",
                "opt_m": "mapping_network_optim_state_dict",
                "opt_s": "style_extractor_optim_state_dict",
            }[key]
            opts[key] = _adam_state(tpl, sd, ckpt[torch_key], build)
        else:
            opts[key] = tpl

    # image buffer: list of [1,C,H,W] NCHW tensors -> [size,H,W,C] + count
    buf_tpl = template.buffer
    size = buf_tpl.images.shape[0]
    stored = ckpt.get("image_buffer_images", [])
    n = min(len(stored), size)
    if len(stored) > size:
        print(
            f"warning: checkpoint buffer holds {len(stored)} images but "
            f"image_buffer_size={size}; keeping the first {size}"
        )
    images = np.zeros(buf_tpl.images.shape, np.float32)
    if n:
        cat = torch.cat(list(stored[:n]), 0).detach().cpu().numpy()
        images[:n] = cat.transpose(0, 2, 3, 1)
    buffer = buf_tpl._replace(
        images=jnp.asarray(images, buf_tpl.images.dtype),
        count=jnp.asarray(n, buf_tpl.count.dtype),
    )

    ada = template.ada._replace(
        p=jnp.asarray(float(ckpt.get("ada_p", 0.0)), jnp.float32)
    )

    state = template.replace(
        step=jnp.asarray(step, template.step.dtype),
        params_g=mapped["generator"],
        params_d=mapped["discriminator"],
        params_m=mapped["mapping_network"],
        params_s=mapped["style_extractor"],
        opt_g=opts["opt_g"],
        opt_d=opts["opt_d"],
        opt_m=opts["opt_m"],
        opt_s=opts["opt_s"],
        ada=ada,
        buffer=buffer,
        ema_params_g=(
            jax.tree.map(jnp.copy, mapped["generator"])
            if template.ema_params_g is not None
            else None
        ),
    )
    return state, step


def migrate(
    config_path: str | Path,
    tar_path: str | Path,
    *,
    import_optimizer: bool = True,
) -> int:
    """Import ``tar_path`` and write it as the run's Orbax checkpoint."""
    from one_to_many_gan_tpu.core.trainer import _checkpoint_manager, save_checkpoint

    config = load_config(config_path)
    state, step = import_torch_checkpoint(
        config, tar_path, import_optimizer=import_optimizer
    )
    mgr = _checkpoint_manager(config)
    save_checkpoint(mgr, step, state)
    return step


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Import a reference torch checkpoint (<step>.tar) as a "
        "native Orbax checkpoint; train.py/serve.py/generate.py then resume "
        "from it."
    )
    ap.add_argument("config", help="config.toml (must match the checkpoint's "
                    "architecture; checkpoint_directory/training_run name the "
                    "destination run)")
    ap.add_argument("checkpoint", help="reference <step>.tar file")
    ap.add_argument(
        "--no-optim",
        action="store_true",
        help="reset Adam moments instead of importing them (weight-only "
        "warm start)",
    )
    args = ap.parse_args()
    step = migrate(args.config, args.checkpoint, import_optimizer=not args.no_optim)
    print(f"imported step {step}; run train.py/serve.py with this config to resume")


if __name__ == "__main__":
    main()
