"""Model structure/shape tests across image-size configurations.

Exercises the generator's constructive arithmetic
(SURVEY.md §2 item 10; reference builder.py:153-158) and the four models'
public APIs (encode/decode/extract, patch logits, style extraction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_to_many_gan_tpu.models import (
    Discriminator,
    Generator,
    MappingNetwork,
    StyleExtractor,
    StyleRngs,
    apply_domain,
    generator_arithmetic,
    sample_style_rngs,
)


@pytest.mark.parametrize(
    "image_size,min_latent,n_blocks,expected",
    [
        ((512, 256), 64, 7, (2, 3, 4, 6)),  # reference default config
        ((256, 256), 64, 7, (2, 3, 4, 6)),
        ((64, 64), 64, 7, (0, 3, 4, 4)),  # CPU smoke config: no resampling
        ((128, 128), 32, 5, (2, 2, 3, 5)),
    ],
)
def test_generator_arithmetic(image_size, min_latent, n_blocks, expected):
    assert generator_arithmetic(image_size, min_latent, n_blocks) == expected


@pytest.mark.parametrize("image_size", [(64, 64), (64, 32)])
def test_generator_roundtrip_shapes(image_size):
    h, w = image_size
    gen = Generator(
        channels=1,
        w_dim=6,
        image_size=image_size,
        min_latent_resolution=16,
        n_resnet_blocks=3,
    )
    x = jnp.zeros((2, h, w, 1))
    wv = jnp.zeros((gen.n_style_blocks, 2, 6))
    params = gen.init(jax.random.key(0), x, wv)

    latent = gen.apply(params, x, method="encode")
    n_down = generator_arithmetic(image_size, 16, 3)[0]
    assert latent.shape == (2, h // 2**n_down, w // 2**n_down, 64 * 2**n_down)

    out = gen.apply(params, latent, wv, method="decode")
    assert out.shape == x.shape
    assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh output

    feats = gen.apply(params, latent, wv, method="extract")
    assert len(feats) == gen.n_style_blocks


def test_extract_taps_match_decode_prefix():
    """First extract tap equals the first modulated block's decode output."""
    gen = Generator(
        channels=1, w_dim=4, image_size=(32, 32), min_latent_resolution=16,
        n_resnet_blocks=3,
    )
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 1))
    wv = jax.random.normal(jax.random.key(2), (gen.n_style_blocks, 1, 4))
    params = gen.init(jax.random.key(0), x, wv)
    latent = gen.apply(params, x, method="encode")
    feats = gen.apply(params, latent, wv, method="extract")
    # Feature resolutions: resnet taps at latent res, upsample taps double.
    lh = latent.shape[1]
    n_dec = generator_arithmetic((32, 32), 16, 3)[2]
    for i, f in enumerate(feats):
        if i < n_dec:
            assert f.shape[1] == lh
        else:
            assert f.shape[1] == lh * 2 ** (i - n_dec + 1)


def test_discriminator_patch_logits():
    disc = Discriminator()
    x = jnp.zeros((2, 64, 64, 1))
    params = disc.init(jax.random.key(0), x)
    scores = disc.apply(params, x)
    assert scores.shape[0] == 2 and scores.shape[-1] == 1
    assert scores.shape[1] > 1 and scores.shape[2] > 1  # patch map, not scalar


def test_style_extractor_output():
    se = StyleExtractor(w_dim=6)
    x = jnp.zeros((3, 64, 64, 1))
    params = se.init(jax.random.key(0), x)
    w = se.apply(params, x)
    assert w.shape == (3, 6)


class TestMappingNetwork:
    def _net_and_params(self, w_dim=6, n_layers=2):
        net = MappingNetwork(features=w_dim, n_layers=n_layers)
        params = net.init(jax.random.key(0), jnp.zeros((2, w_dim)))
        return net, params

    def test_forward_nonnegative_final_relu(self):
        """Last activation is ReLU so θ=0 can yield an exactly-zero style."""
        net, params = self._net_and_params()
        z = jax.random.normal(jax.random.key(1), (16, 6))
        s = net.apply(params, z)
        assert np.all(np.asarray(s) >= 0)

    def test_style_vector_no_mixing_is_broadcast(self):
        net, params = self._net_and_params()
        rngs = sample_style_rngs(jax.random.key(2), 4, 6, 5, mixing_prob=1.0)
        s = net.apply(params, rngs, 5, mix_styles=False, method="style_vector")
        assert s.shape == (5, 4, 6)
        np.testing.assert_array_equal(np.asarray(s[0]), np.asarray(s[4]))

    def test_style_vector_mixing_crossover(self):
        net, params = self._net_and_params()
        z1 = jax.random.normal(jax.random.key(3), (2, 6))
        z2 = jax.random.normal(jax.random.key(4), (2, 6))
        rngs = StyleRngs(
            z1=z1, z2=z2, mix=jnp.asarray(True), crossover=jnp.asarray(2)
        )
        s = net.apply(params, rngs, 5, method="style_vector")
        s1 = net.apply(params, z1)
        s2 = net.apply(params, z2)
        np.testing.assert_allclose(np.asarray(s[0]), np.asarray(s1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s[1]), np.asarray(s1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s[2]), np.asarray(s2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s[4]), np.asarray(s2), rtol=1e-6)

    def test_crossover_zero_uses_all_second_style(self):
        net, params = self._net_and_params()
        z1 = jax.random.normal(jax.random.key(5), (1, 6))
        z2 = jax.random.normal(jax.random.key(6), (1, 6))
        rngs = StyleRngs(z1=z1, z2=z2, mix=jnp.asarray(True), crossover=jnp.asarray(0))
        s = net.apply(params, rngs, 3, method="style_vector")
        s2 = net.apply(params, z2)
        for i in range(3):
            np.testing.assert_allclose(np.asarray(s[i]), np.asarray(s2), rtol=1e-6)


def test_apply_domain_scalar_and_vector():
    s = jnp.ones((3, 4, 6))
    assert np.allclose(np.asarray(apply_domain(s, 0.0)), 0.0)
    assert np.allclose(np.asarray(apply_domain(s, 1.0)), 1.0)
    d = jnp.asarray([0.0, 0.5, 1.0, 0.25])
    w = apply_domain(s, d)
    np.testing.assert_allclose(np.asarray(w[:, 1]), 0.5)
    np.testing.assert_allclose(np.asarray(w[:, 3]), 0.25)
