"""Checkpoint migration: a reference torch .tar imports as a native resume.

Builds the ACTUAL reference models (test-only import, as in
test_reference_parity.py), steps their torch Adam optimisers so the
moments are non-trivial, saves the exact dict the reference writes
(/root/reference/src/core/evaluation.py:240-263), and verifies that
``one_to_many_gan_tpu.migrate`` turns it into a TrainState whose

- forwards equal the torch models' (G full translate, D, S, M),
- Adam moments/step equal the torch optimiser's (layout-transposed),
- ADA p and image buffer carry over,
- and from which the Trainer RESUMES mid-flight end to end.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = Path("/root/reference")
if not (REFERENCE_ROOT / "src" / "model" / "builder.py").exists():
    pytest.skip("reference tree not mounted", allow_module_level=True)
if str(REFERENCE_ROOT) not in sys.path:
    sys.path.insert(0, str(REFERENCE_ROOT))

from src.model import builder as ref_builder  # noqa: E402

from one_to_many_gan_tpu.config import load_config  # noqa: E402
from one_to_many_gan_tpu.core.state import Models  # noqa: E402
from one_to_many_gan_tpu.data import synthetic_images  # noqa: E402
from one_to_many_gan_tpu.migrate import (  # noqa: E402
    MigrationError,
    import_torch_checkpoint,
    migrate,
)
from tests.helpers import write_tiny_config  # noqa: E402

# must match tests/helpers.py TINY_TOML's [architecture]/[data]
IMAGE_SIZE = (32, 32)
W_DIM = 6
MIN_LATENT = 16
N_RESNET = 3
N_MAP_LAYERS = 2
BATCH = 2
STEP = 7
ADA_P = 0.125
N_BUFFERED = 3


def t2n(t):
    return t.detach().cpu().numpy()


def to_torch(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """Reference models + optimisers stepped twice, saved as ``7.tar``."""
    tmp = tmp_path_factory.mktemp("migrate")
    torch.manual_seed(0)
    tg = ref_builder.Generator(
        input_nc=1,
        w_dim=W_DIM,
        image_size=IMAGE_SIZE,
        min_latent_resolution=MIN_LATENT,
        n_resnet_blocks=N_RESNET,
    )
    td = ref_builder.Discriminator(input_nc=1)
    ts = ref_builder.StyleExtractor(input_nc=1, w_dim=W_DIM)
    tm = ref_builder.MappingNetwork(
        features=W_DIM, n_layers=N_MAP_LAYERS, style_mixing_prob=0.9
    )
    opts = {
        name: torch.optim.Adam(m.parameters(), lr=2e-3, betas=(0.5, 0.99))
        for name, m in (("g", tg), ("d", td), ("s", ts), ("m", tm))
    }
    n_blocks = tg.n_style_blocks
    for _ in range(2):  # non-trivial exp_avg/exp_avg_sq/step everywhere
        x = torch.randn(BATCH, 1, *IMAGE_SIZE)
        w = torch.randn(n_blocks, BATCH, W_DIM)
        losses = {
            "g": tg.decode(tg.encode(x), w).square().mean(),
            "d": td(x).square().mean(),
            "s": ts(x).square().mean(),
            "m": tm(torch.randn(BATCH, W_DIM)).square().mean(),
        }
        for name, opt in opts.items():
            opt.zero_grad()
            losses[name].backward()
            opt.step()
    buffered = [torch.randn(1, 1, *IMAGE_SIZE) for _ in range(N_BUFFERED)]
    tar = tmp / f"{STEP}.tar"
    torch.save(
        {  # exact reference schema (evaluation.py:248-263)
            "generator_state_dict": tg.state_dict(),
            "generator_optim_state_dict": opts["g"].state_dict(),
            "discriminator_state_dict": td.state_dict(),
            "discriminator_optim_state_dict": opts["d"].state_dict(),
            "mapping_network_state_dict": tm.state_dict(),
            "mapping_network_optim_state_dict": opts["m"].state_dict(),
            "style_extractor_state_dict": ts.state_dict(),
            "style_extractor_optim_state_dict": opts["s"].state_dict(),
            "ada_p": ADA_P,
            "image_buffer_images": buffered,
            "image_buffer_size": 4,
        },
        tar,
    )
    config = load_config(write_tiny_config(tmp, training_steps=8))
    return {
        "tar": tar,
        "config": config,
        "tmp": tmp,
        "tg": tg.eval(),
        "td": td.eval(),
        "ts": ts.eval(),
        "tm": tm.eval(),
        "opt_g": opts["g"],
        "buffered": buffered,
        "n_blocks": n_blocks,
    }


@pytest.fixture(scope="module")
def imported(checkpoint):
    state, step = import_torch_checkpoint(checkpoint["config"], checkpoint["tar"])
    assert step == STEP
    assert int(state.step) == STEP
    return state


def close(a, b, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=rtol, atol=atol
    )


def test_forward_equality(checkpoint, imported):
    """The imported params reproduce every torch model's forward."""
    models = Models(checkpoint["config"])
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (BATCH, *IMAGE_SIZE, 1)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((checkpoint["n_blocks"], BATCH, W_DIM)), jnp.float32
    )
    z = jnp.asarray(rng.standard_normal((BATCH, W_DIM)), jnp.float32)
    with torch.no_grad():
        ref_g = checkpoint["tg"].decode(
            checkpoint["tg"].encode(to_torch(x)), torch.from_numpy(np.asarray(w))
        )
        ref_d = checkpoint["td"](to_torch(x))
        ref_s = checkpoint["ts"](to_torch(x))
        ref_m = checkpoint["tm"](torch.from_numpy(np.asarray(z)))
    lat = models.generator.apply(imported.params_g, x, method="encode")
    ours_g = models.generator.apply(imported.params_g, lat, w, method="decode")
    close(ours_g, t2n(ref_g).transpose(0, 2, 3, 1))
    close(models.discriminator.apply(imported.params_d, x),
          t2n(ref_d).transpose(0, 2, 3, 1))
    close(models.extractor.apply(imported.params_s, x), t2n(ref_s))
    close(models.mapping.apply(imported.params_m, z), t2n(ref_m))
    # reference has no EMA: with tpu.ema_decay > 0 the EMA starts at the
    # imported weights (tiny config default has EMA off -> None)
    assert imported.ema_params_g is None
    ema_dir = checkpoint["tmp"] / "ema"
    ema_dir.mkdir(exist_ok=True)
    cfg_ema = load_config(
        write_tiny_config(ema_dir, tpu_section="\n[tpu]\nema_decay = 0.999\n")
    )
    state_ema, _ = import_torch_checkpoint(cfg_ema, checkpoint["tar"])
    for a, b in zip(
        jax.tree.leaves(state_ema.ema_params_g),
        jax.tree.leaves(state_ema.params_g),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_optimizer_moments_imported(checkpoint, imported):
    """Adam moments carry over with the parameter layout transposes, and
    optax's count equals torch's per-param step."""
    adam = imported.opt_g[0]
    assert int(adam.count) == 2
    # torch param id 0 is the generator's first parameter: encoder.1.bias
    # (stem conv bias); its moment lands at params/enc_stem/bias untouched
    tstate = checkpoint["opt_g"].state_dict()["state"]
    close(adam.mu["params"]["enc_stem"]["bias"], t2n(tstate[0]["exp_avg"]))
    close(adam.nu["params"]["enc_stem"]["bias"], t2n(tstate[0]["exp_avg_sq"]))
    # id 1 is encoder.1.weight.weight (OIHW): moment transposed like the
    # weight (HWIO)
    close(
        adam.mu["params"]["enc_stem"]["weight"],
        t2n(tstate[1]["exp_avg"]).transpose(2, 3, 1, 0),
    )
    # every moment tree leaf is non-trivially populated
    assert any(
        float(jnp.abs(leaf).max()) > 0 for leaf in jax.tree.leaves(adam.mu)
    )


def test_ada_and_buffer_imported(checkpoint, imported):
    assert float(imported.ada.p) == pytest.approx(ADA_P)
    assert int(imported.ada.count) == 0  # fresh window (reference saves only p)
    assert int(imported.buffer.count) == N_BUFFERED
    want = torch.cat(checkpoint["buffered"], 0).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(imported.buffer.images[:N_BUFFERED]), want, rtol=1e-6, atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(imported.buffer.images[N_BUFFERED:]), 0
    )


def test_no_optim_flag(checkpoint):
    state, _ = import_torch_checkpoint(
        checkpoint["config"], checkpoint["tar"], import_optimizer=False
    )
    adam = state.opt_g[0]
    assert int(adam.count) == 0
    assert all(float(jnp.abs(x).max()) == 0 for x in jax.tree.leaves(adam.mu))


def test_architecture_mismatch_raises(checkpoint, tmp_path):
    bad = load_config(write_tiny_config(tmp_path, n_resnet_blocks=5))
    with pytest.raises(MigrationError, match="missing|shape"):
        import_torch_checkpoint(bad, checkpoint["tar"])


def test_trainer_resumes_from_migrated_checkpoint(checkpoint):
    """End to end: migrate() writes the Orbax checkpoint and a Trainer
    resumes from the reference's step, mid-flight."""
    from one_to_many_gan_tpu.core.trainer import Trainer

    config = checkpoint["config"]
    step = migrate(checkpoint["tmp"] / "config.toml", checkpoint["tar"])
    assert step == STEP
    trainer = Trainer(
        config,
        shoeprint_images=synthetic_images(8, IMAGE_SIZE, seed=0),
        shoemark_images=synthetic_images(8, IMAGE_SIZE, seed=1),
        verbose=False,
    )
    assert trainer.start_step == STEP
    assert float(trainer.state.ada.p) == pytest.approx(ADA_P)
    state = trainer.run()  # training_steps=8 -> one real step from 7
    assert int(state.step) == 8
