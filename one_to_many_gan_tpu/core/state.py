"""Training state: one pytree carrying everything the fused step mutates.

The reference spreads state across 4 nn.Modules, 4 torch optimizers, a
host-side ADA controller, and a host-side image buffer (train.py:72-199).
Here it is a single immutable pytree — donate-able to the jitted step,
checkpointable with Orbax in one call, and shardable with one spec.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from one_to_many_gan_tpu.augment import AdaState, init_ada_state
from one_to_many_gan_tpu.config import Config
from one_to_many_gan_tpu.core.buffer import BufferState, init_buffer
from one_to_many_gan_tpu.models import (
    Discriminator,
    Generator,
    MappingNetwork,
    StyleExtractor,
)


@struct.dataclass
class TrainState:
    step: jax.Array
    params_g: Any
    params_d: Any
    params_m: Any
    params_s: Any
    opt_g: Any
    opt_d: Any
    opt_m: Any
    opt_s: Any
    ada: AdaState
    buffer: BufferState
    ema_params_g: Any  # generator EMA params, or None when disabled


class Models:
    """The four model definitions, built once from config.

    ``int8_decode`` builds the generator with int8 decoder convs — an
    inference-only variant with an IDENTICAL param tree (serve.py --int8,
    generate.py --int8); ``make_train_step`` rejects it.
    """

    def __init__(self, config: Config, *, int8_decode: bool = False):
        arch = config["architecture"]
        data = config["data"]
        dtype = (
            jnp.bfloat16 if config["tpu"]["precision"] == "bfloat16" else jnp.float32
        )
        self.dtype = dtype
        self.image_size = tuple(data["image_size"])
        self.channels = data["image_channels"]
        self.w_dim = arch["w_dim"]
        # The generator head conv's output space-to-depth formulation
        # partitions incorrectly under XLA SPMD spatial (H) sharding —
        # disable it whenever the config shards the spatial axis
        # (ops/equalized.py). The env override is resolved HERE, once, so
        # traced programs are a pure function of the built modules.
        import os

        env = os.environ.get("OTM_S2D_OUTCONV")
        head_s2d = (
            0
            if config["tpu"]["spatial_parallel"] > 1
            else (int(env) if env is not None else 8)
        )
        # Same H-sharding caveat as head_s2d: the packing's
        # reshape/transpose across H partitions incorrectly under sp > 1.
        s2d_pack = (
            config["tpu"]["s2d_pack"]
            and config["tpu"]["spatial_parallel"] == 1
        )
        self.generator = Generator(
            channels=self.channels,
            w_dim=arch["w_dim"],
            image_size=self.image_size,
            min_latent_resolution=arch["min_latent_resolution"],
            n_resnet_blocks=arch["n_resnet_blocks"],
            dtype=dtype,
            head_s2d=head_s2d,
            s2d_pack=s2d_pack,
            int8_decode=int8_decode,
        )
        self.int8_decode = int8_decode
        self.discriminator = Discriminator(dtype=dtype)
        self.mapping = MappingNetwork(
            features=arch["w_dim"], n_layers=arch["mapping_network_layers"]
        )
        self.extractor = StyleExtractor(w_dim=arch["w_dim"], dtype=dtype)
        self.n_style_blocks = self.generator.n_style_blocks


def make_optimizers(config: Config) -> dict[str, optax.GradientTransformation]:
    """Adam per network; mapping network runs 100x slower LR
    (reference train.py:94-116, config.toml:22-24)."""
    opt = config["optimisation"]
    b1, b2 = opt["adam_betas"]

    def adam(lr: float) -> optax.GradientTransformation:
        return optax.adam(lr, b1=b1, b2=b2, eps=1e-8)

    return {
        "g": adam(opt["learning_rate"]),
        "d": adam(opt["learning_rate"]),
        "m": adam(opt["mapping_network_learning_rate"]),
        "s": adam(opt["learning_rate"]),
    }


def init_train_state(config: Config, models: Models, rng: jax.Array) -> TrainState:
    h, w = models.image_size
    c = models.channels
    batch = config["training"]["batch_size"]
    kg, kd, km, ks = jax.random.split(rng, 4)

    dummy_img = jnp.zeros((1, h, w, c), jnp.float32)
    dummy_w = jnp.zeros((models.n_style_blocks, 1, models.w_dim), jnp.float32)
    dummy_z = jnp.zeros((1, models.w_dim), jnp.float32)

    params_g = models.generator.init(kg, dummy_img, dummy_w)
    params_d = models.discriminator.init(kd, dummy_img)
    params_m = models.mapping.init(km, dummy_z)
    params_s = models.extractor.init(ks, dummy_img)

    opts = make_optimizers(config)
    ema_decay = config["tpu"]["ema_decay"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        params_m=params_m,
        params_s=params_s,
        opt_g=opts["g"].init(params_g),
        opt_d=opts["d"].init(params_d),
        opt_m=opts["m"].init(params_m),
        opt_s=opts["s"].init(params_s),
        ada=init_ada_state(),
        buffer=init_buffer(
            config["training"]["image_buffer_size"], (h, w, c), jnp.float32
        ),
        ema_params_g=jax.tree.map(jnp.copy, params_g) if ema_decay > 0 else None,
    )


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def eval_params_g(state: TrainState):
    """Generator parameters for evaluation/inference.

    The EMA weights (tpu.ema_decay > 0) are what EMA exists for: FID,
    image grids, and the generate CLI must all sample from them, not the
    raw optimizer iterates. Falls back to ``params_g`` when EMA is off.
    """
    return state.ema_params_g if state.ema_params_g is not None else state.params_g
