"""Generator: CycleGAN-style encoder/decoder with StyleGAN2-modulated decoder.

Behavioral contract (reference: src/model/builder.py:138-253):

Encoder (style-free):
  reflect-pad 3 -> eq-conv7x7(C -> 64) -> InstanceNorm -> ReLU
  n_downsamples x [eq-conv3x3(f -> 2f, zero pad 1) -> IN -> ReLU -> DownSample]
  (n_resnet_blocks // 2) x ResnetBlock
where n_downsamples = ceil(log2(min(image_size) / min_latent_resolution))
(builder.py:153-158).

Decoder (style-routed; one style vector per *style block*):
  ceil(n_resnet_blocks / 2) x ModulatedResnetBlock
  n_downsamples x [UpSample -> modulated conv3x3(f -> f/2, zero pad 1) -> ReLU]
  reflect-pad 3 -> eq-conv7x7(-> C) -> tanh

``n_style_blocks`` = decoder resnet blocks + upsample convs (each
ModulatedResnetBlock consumes ONE w for both its convs, builder.py:220-230).

``extract`` returns the feature map after each style block (the tap for
the θ-path-length loss, builder.py:232-249): after each modulated resnet
block's residual add, and after each upsample-stage modulated conv — where
the stored tap is *post*-ReLU for every upsample conv except the last
(the reference's ``nn.ReLU(inplace=True)`` mutates the appended tensor);
it returns immediately after the last style block, pre-ReLU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from one_to_many_gan_tpu.models.blocks import ModulatedResnetBlock, ResnetBlock
from one_to_many_gan_tpu.ops import (
    EqualizedConv,
    ModulatedConv,
    downsample2x,
    instance_norm,
    upsample2x,
)


def generator_arithmetic(
    image_size: tuple[int, int], min_latent_resolution: int, n_resnet_blocks: int
) -> tuple[int, int, int, int]:
    """(n_downsamples, n_encoder_blocks, n_decoder_blocks, n_style_blocks)."""
    n_down = math.ceil(math.log2(min(image_size) / min_latent_resolution))
    n_enc = n_resnet_blocks // 2
    n_dec = math.ceil(n_resnet_blocks / 2)
    return n_down, n_enc, n_dec, n_dec + n_down


class Generator(nn.Module):
    channels: int
    w_dim: int
    image_size: tuple[int, int]
    min_latent_resolution: int
    n_resnet_blocks: int
    start_filters: int = 64
    dtype: jnp.dtype = jnp.float32
    # output-conv space-to-depth factor (0 under spatial sharding; see
    # ops/equalized.py EqualizedConv.s2d_out)
    head_s2d: int = 8
    # space-to-depth packing of the low-channel large-spatial 3x3 convs
    # (ops/equalized.py conv3x3_s2d_packed; tpu.s2d_pack via Models)
    s2d_pack: bool = False
    # Inference-only int8 decoder convs (ops/quantize.py): the modulated
    # convs — where the decode's FLOPs concentrate (SURVEY §3.3) — run
    # int8 x int8 on the MXU at 2x the bf16 peak. Same param tree as the
    # f32 model, so trained checkpoints/artifacts load unchanged. The
    # training path rejects this flag (core/train_step.py).
    int8_decode: bool = False

    @property
    def n_style_blocks(self) -> int:
        return generator_arithmetic(
            self.image_size, self.min_latent_resolution, self.n_resnet_blocks
        )[3]

    @property
    def latent_features(self) -> int:
        n_down = generator_arithmetic(
            self.image_size, self.min_latent_resolution, self.n_resnet_blocks
        )[0]
        return self.start_filters * (2**n_down)

    def setup(self):
        n_down, n_enc, n_dec, _ = generator_arithmetic(
            self.image_size, self.min_latent_resolution, self.n_resnet_blocks
        )
        f = self.start_filters
        self.enc_stem = EqualizedConv(
            f, 7, padding=3, pad_mode="reflect", dtype=self.dtype
        )
        enc_down = []
        for _ in range(n_down):
            enc_down.append(
                EqualizedConv(
                    f * 2, 3, padding=1, dtype=self.dtype, s2d_in=self.s2d_pack
                )
            )
            f *= 2
        self.enc_down = enc_down
        self.enc_blocks = [ResnetBlock(f, dtype=self.dtype) for _ in range(n_enc)]

        self.dec_blocks = [
            ModulatedResnetBlock(f, dtype=self.dtype, int8=self.int8_decode)
            for _ in range(n_dec)
        ]
        dec_up = []
        for _ in range(n_down):
            dec_up.append(
                ModulatedConv(
                    f // 2, 3, padding=1, dtype=self.dtype,
                    s2d_in=self.s2d_pack, int8=self.int8_decode,
                )
            )
            f //= 2
        self.dec_up = dec_up
        self.out_conv = EqualizedConv(
            self.channels,
            7,
            padding=3,
            pad_mode="reflect",
            dtype=self.dtype,
            s2d_out=self.head_s2d,
        )

    def encode(self, x: jax.Array) -> jax.Array:
        """Image [B,H,W,C] -> latent feature map."""
        z = jax.nn.relu(instance_norm(self.enc_stem(x.astype(self.dtype))))
        for conv in self.enc_down:
            z = jax.nn.relu(instance_norm(conv(z)))
            z = downsample2x(z)
        for block in self.enc_blocks:
            z = block(z)
        return z

    def decode(self, z: jax.Array, w: jax.Array) -> jax.Array:
        """Latent + per-block styles w [n_style_blocks, B, w_dim] -> image."""
        i = 0
        for block in self.dec_blocks:
            z = block(z, w[i])
            i += 1
        for conv in self.dec_up:
            z = upsample2x(z)
            z = jax.nn.relu(conv(z, w[i]))
            i += 1
        return jnp.tanh(self.out_conv(z))

    def extract(self, z: jax.Array, w: jax.Array) -> list[jax.Array]:
        """Feature maps after each style block (path-loss taps).

        Tap placement matches the reference's OBSERVED semantics, not its
        apparent ones: ``extract`` (builder.py:232-249) appends the conv
        output and the decoder's ``nn.ReLU(inplace=True)`` (builder.py:197)
        then mutates that same tensor in place — so every upsample-conv tap
        EXCEPT the last is effectively post-ReLU; the last style block
        returns before its ReLU runs and stays pre-ReLU. Verified against
        the actual reference code by weight transplant
        (tests/test_reference_parity.py::test_generator_extract_all_taps).
        """
        features = []
        n_total = len(self.dec_blocks) + len(self.dec_up)
        i = 0
        for block in self.dec_blocks:
            z = block(z, w[i])
            features.append(z)
            i += 1
        for conv in self.dec_up:
            z = upsample2x(z)
            z = conv(z, w[i])
            i += 1
            if i < n_total:
                z = jax.nn.relu(z)
            features.append(z)
        return features

    def __call__(self, x: jax.Array, w: jax.Array) -> jax.Array:
        return self.decode(self.encode(x), w)
