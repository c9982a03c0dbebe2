"""Weight-transplant parity against the ACTUAL reference code (VERDICT r3 #2).

Every other exactness test in this suite compares against torch oracles
re-authored in the test files; a transcription error shared by the module
and its oracle would pass them all. This module retires that risk: it
imports the reference's own model classes from ``/root/reference/src``
(test-only — the framework never imports reference code), copies their
randomly-initialized weights into the JAX modules (OIHW->HWIO transposes),
and asserts forward equality at float32 for

- MappingNetwork.forward and the mixed style_vector stack
  (reference builder.py:16-132),
- Generator encode / decode / extract — every path-loss tap —
  (builder.py:138-253),
- Discriminator and StyleExtractor (builder.py:259-320),

then compares every loss term of one fixed-draw D step + G step
(training.py:71-128, :136-257) with ADA as identity (p=0) and both sides
fed identical z/theta/h draws.

The reference package is imported, never copied; if the mounted tree is
absent the module skips.
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
from src.model import loss as ref_loss  # noqa: E402

from one_to_many_gan_tpu.models import (  # noqa: E402
    Discriminator,
    Generator,
    MappingNetwork,
    StyleExtractor,
)
from one_to_many_gan_tpu.models.generator import generator_arithmetic  # noqa: E402

# Small-but-structurally-complete shape set: 2 downsamples, odd resnet
# split (1 encoder / 2 decoder blocks), 4 style blocks.
IMAGE_SIZE = (64, 64)
MIN_LATENT = 16
N_RESNET = 3
W_DIM = 8
BATCH = 2


def t2n(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy()


def to_torch(x) -> torch.Tensor:
    """NHWC jax/numpy -> NCHW torch."""
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())


def to_jax(t: torch.Tensor) -> jnp.ndarray:
    """NCHW torch -> NHWC jax."""
    return jnp.asarray(t2n(t).transpose(0, 2, 3, 1))


# ------------------------------------------------------- transplant helpers


def lin_params(tl) -> dict:
    """reference EqualisedLinear (layers.py:27-43): weight [out,in] ->
    ours [in,out]; the He constant is applied at use time on both sides."""
    return {"weight": t2n(tl.weight.weight).T, "bias": t2n(tl.bias)}


def conv_params(tc) -> dict:
    """reference EqualisedConv2d (layers.py:46-108): OIHW -> HWIO."""
    p = {"weight": t2n(tc.weight.weight).transpose(2, 3, 1, 0)}
    if tc.use_bias:
        p["bias"] = t2n(tc.bias)
    return p


def modconv_params(tm) -> dict:
    """reference Conv2dWeightModulate (layers.py:111-188)."""
    return {
        "weight": t2n(tm.weight.weight).transpose(2, 3, 1, 0),
        "to_style": lin_params(tm.to_style),
    }


def generator_params(tg, *, start_filters: int) -> dict:
    n_down, n_enc, n_dec, _ = generator_arithmetic(IMAGE_SIZE, MIN_LATENT, N_RESNET)
    enc = list(tg.encoder)
    params: dict = {"enc_stem": conv_params(enc[1])}
    idx = 4  # [pad, stem conv, IN, ReLU] then 4-op downsample groups
    for i in range(n_down):
        params[f"enc_down_{i}"] = conv_params(enc[idx])
        idx += 4  # [conv, IN, ReLU, DownSample]
    for i in range(n_enc):
        cb = list(enc[idx].conv_block)  # [pad, conv, IN, ReLU, pad, conv, IN]
        params[f"enc_blocks_{i}"] = {
            "EqualizedConv_0": conv_params(cb[1]),
            "EqualizedConv_1": conv_params(cb[5]),
        }
        idx += 1
    dec = list(tg.decoder)
    j = 0
    for i in range(n_dec):
        cb = list(dec[j].conv_block)  # [pad, modconv, ReLU, pad, modconv]
        params[f"dec_blocks_{i}"] = {
            "ModulatedConv_0": modconv_params(cb[1]),
            "ModulatedConv_1": modconv_params(cb[4]),
        }
        j += 1
    for i in range(n_down):
        j += 1  # UpSample
        params[f"dec_up_{i}"] = modconv_params(dec[j])
        j += 2  # modconv itself + ReLU
    j += 1  # ReflectionPad2d(3)
    params["out_conv"] = conv_params(dec[j])
    return {"params": params}


def trunk_params(tmodel, conv_idx=(0, 3, 7, 11)) -> dict:
    return {
        f"EqualizedConv_{i}": conv_params(tmodel[k]) for i, k in enumerate(conv_idx)
    }


def discriminator_params(td) -> dict:
    p = trunk_params(td.model)
    p["EqualizedConv_4"] = conv_params(td.model[14])
    return {"params": p}


def extractor_params(ts) -> dict:
    p = trunk_params(ts.model)
    p["EqualizedLinear_0"] = lin_params(ts.model[16])
    return {"params": p}


def mapping_params(tm) -> dict:
    lins = [m for m in tm.net if isinstance(m, type(tm.net[0]))]
    return {
        "params": {f"EqualizedLinear_{i}": lin_params(m) for i, m in enumerate(lins)}
    }


def assert_tree_matches_init(transplanted, init_params) -> None:
    """Loudly catch transplant-mapping mistakes: same structure, same shapes."""
    ts = jax.tree_util.tree_structure(transplanted)
    js = jax.tree_util.tree_structure(init_params)
    assert ts == js, f"param tree mismatch:\n{ts}\nvs init\n{js}"
    for a, b in zip(
        jax.tree_util.tree_leaves(transplanted),
        jax.tree_util.tree_leaves(init_params),
        strict=True,
    ):
        assert np.shape(a) == np.shape(b)


def close(a, b, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=rtol, atol=atol
    )


# ----------------------------------------------------------------- fixtures


@pytest.fixture(scope="module")
def models():
    """Reference torch models + JAX params transplanted from their weights."""
    torch.manual_seed(0)
    sf = 8  # small filters: the transplant code paths are identical at 64
    tg = ref_builder.Generator(
        input_nc=1,
        w_dim=W_DIM,
        image_size=IMAGE_SIZE,
        min_latent_resolution=MIN_LATENT,
        n_resnet_blocks=N_RESNET,
        start_filters=sf,
    ).eval()
    td = ref_builder.Discriminator(input_nc=1).eval()
    ts = ref_builder.StyleExtractor(input_nc=1, w_dim=W_DIM).eval()
    tm = ref_builder.MappingNetwork(
        features=W_DIM, n_layers=3, style_mixing_prob=0.9
    ).eval()

    jg = Generator(
        channels=1,
        w_dim=W_DIM,
        image_size=IMAGE_SIZE,
        min_latent_resolution=MIN_LATENT,
        n_resnet_blocks=N_RESNET,
        start_filters=sf,
    )
    jd = Discriminator()
    js = StyleExtractor(w_dim=W_DIM)
    jm = MappingNetwork(features=W_DIM, n_layers=3)

    n_blocks = jg.n_style_blocks
    assert n_blocks == tg.n_style_blocks  # constructive arithmetic parity

    key = jax.random.key(0)
    pg_init = jg.init(
        key, jnp.zeros((1, *IMAGE_SIZE, 1)), jnp.zeros((n_blocks, 1, W_DIM))
    )
    pd_init = jd.init(key, jnp.zeros((1, *IMAGE_SIZE, 1)))
    ps_init = js.init(key, jnp.zeros((1, *IMAGE_SIZE, 1)))
    pm_init = jm.init(key, jnp.zeros((1, W_DIM)))

    pg = generator_params(tg, start_filters=sf)
    pd = discriminator_params(td)
    ps = extractor_params(ts)
    pm = mapping_params(tm)
    assert_tree_matches_init(pg, pg_init)
    assert_tree_matches_init(pd, pd_init)
    assert_tree_matches_init(ps, ps_init)
    assert_tree_matches_init(pm, pm_init)
    return {
        "tg": tg,
        "td": td,
        "ts": ts,
        "tm": tm,
        "jg": jg,
        "jd": jd,
        "js": js,
        "jm": jm,
        "pg": pg,
        "pd": pd,
        "ps": ps,
        "pm": pm,
        "n_blocks": n_blocks,
    }


def _rand_images(key, batch=BATCH):
    return jax.random.uniform(key, (batch, *IMAGE_SIZE, 1), minval=-1.0, maxval=1.0)


# --------------------------------------------------------------- model tests


def test_mapping_forward(models):
    z = np.asarray(jax.random.normal(jax.random.key(1), (BATCH, W_DIM)))
    with torch.no_grad():
        ref = models["tm"](torch.from_numpy(z.copy()))
    ours = models["jm"].apply(models["pm"], jnp.asarray(z))
    close(ours, t2n(ref))


def test_generator_encode(models):
    x = _rand_images(jax.random.key(2))
    with torch.no_grad():
        ref = models["tg"].encode(to_torch(x))
    ours = models["jg"].apply(models["pg"], x, method="encode")
    close(ours, t2n(ref).transpose(0, 2, 3, 1))


def test_generator_decode_and_forward(models):
    n_blocks = models["n_blocks"]
    x = _rand_images(jax.random.key(3))
    w = jax.random.normal(jax.random.key(4), (n_blocks, BATCH, W_DIM))
    with torch.no_grad():
        lat_t = models["tg"].encode(to_torch(x))
        ref = models["tg"].decode(lat_t, torch.from_numpy(np.asarray(w).copy()))
    lat = models["jg"].apply(models["pg"], x, method="encode")
    ours = models["jg"].apply(models["pg"], lat, w, method="decode")
    close(ours, t2n(ref).transpose(0, 2, 3, 1))


def test_generator_extract_all_taps(models):
    """Every path-loss tap (builder.py:232-249): after each modulated resnet
    block's residual add, after each upsample conv PRE-ReLU, returning
    immediately at the last style block."""
    n_blocks = models["n_blocks"]
    x = _rand_images(jax.random.key(5))
    w = jax.random.normal(jax.random.key(6), (n_blocks, BATCH, W_DIM))
    lat = models["jg"].apply(models["pg"], x, method="encode")
    ours = models["jg"].apply(models["pg"], lat, w, method="extract")
    with torch.no_grad():
        lat_t = models["tg"].encode(to_torch(x))
        ref = models["tg"].extract(lat_t, torch.from_numpy(np.asarray(w).copy()))
    assert len(ours) == len(ref) == n_blocks
    for i, (o, r) in enumerate(zip(ours, ref, strict=True)):
        got, want = np.asarray(o), t2n(r).transpose(0, 2, 3, 1)
        assert got.shape == want.shape, f"tap {i}"
        close(got, want)


def test_discriminator_forward(models):
    x = _rand_images(jax.random.key(7))
    with torch.no_grad():
        ref = models["td"](to_torch(x))
    ours = models["jd"].apply(models["pd"], x)
    close(ours, t2n(ref).transpose(0, 2, 3, 1))


def test_style_extractor_forward(models):
    x = _rand_images(jax.random.key(8))
    with torch.no_grad():
        ref = models["ts"](to_torch(x))
    ours = models["js"].apply(models["ps"], x)
    close(ours, t2n(ref))


# ------------------------------------------------- fixed-draw step parity


def _torch_style_stack(tm, rngs, n_blocks: int) -> torch.Tensor:
    """The reference's _get_style_vector (builder.py:106-132) fed OUR
    drawn z/mix/crossover values; the mapping forward is the reference's."""
    s1 = tm(torch.from_numpy(np.asarray(rngs.z1).copy()))
    if bool(rngs.mix):
        s2 = tm(torch.from_numpy(np.asarray(rngs.z2).copy()))
        co = int(rngs.crossover)
        return torch.cat(
            [s1[None].expand(co, -1, -1), s2[None].expand(n_blocks - co, -1, -1)],
            dim=0,
        )
    return s1[None].expand(n_blocks, -1, -1).contiguous()


@pytest.fixture(scope="module")
def step_setup(models):
    """Our phase functions + a TrainState carrying the transplanted weights,
    alongside the reference torch models (same weights by construction)."""
    from one_to_many_gan_tpu.core.state import Models as ModelsCls
    from one_to_many_gan_tpu.core.state import init_train_state
    from one_to_many_gan_tpu.core.train_step import make_phase_fns
    from one_to_many_gan_tpu.presets import tiny_config

    config = tiny_config(
        IMAGE_SIZE,
        BATCH,
        min_latent=MIN_LATENT,
        w_dim=W_DIM,
        n_resnet_blocks=N_RESNET,
        buffer_size=8,
        architecture={"mapping_network_layers": 3},
    )
    models_j = ModelsCls(config)
    # swap in the small-filter generator the transplant fixture built (the
    # step math is filter-count-agnostic; sf=8 keeps the CPU run fast)
    models_j.generator = models["jg"]
    models_j.mapping = models["jm"]
    models_j.extractor = models["js"]
    models_j.discriminator = models["jd"]
    state = init_train_state(config, models_j, jax.random.key(0))
    state = state.replace(
        params_g=models["pg"],
        params_d=models["pd"],
        params_m=models["pm"],
        params_s=models["ps"],
    )
    d_phase, g_phase = make_phase_fns(config, models_j)
    return {"config": config, "state": state, "d": d_phase, "g": g_phase}


def _draw_batches(key):
    from one_to_many_gan_tpu.core.train_step import Batches

    ks = jax.random.split(key, 4)
    return Batches(*(_rand_images(k) for k in ks))


def test_d_step_loss_parity(models, step_setup):
    """One fixed-draw discriminator step (training.py:71-128): loss and both
    sign-confidence stats match the reference math run on the reference
    models, with ADA identity (p=0) and a fresh (pass-through) buffer."""
    from one_to_many_gan_tpu.models import sample_style_rngs

    rng = jax.random.key(42)
    batches = _draw_batches(jax.random.key(43))
    state, dm = step_setup["d"](step_setup["state"], batches, rng)

    # reference side, same draws (d_phase consumes keys[0..3] of split(rng,10))
    keys = jax.random.split(rng, 10)
    n_blocks = models["n_blocks"]
    rngs = sample_style_rngs(keys[0], BATCH, W_DIM, n_blocks, 0.9)
    with torch.no_grad():
        w_d = _torch_style_stack(models["tm"], rngs, n_blocks)  # domain=1
        fakes = models["tg"](to_torch(batches.d_shoeprints), w_d)
        # fresh ImageBuffer returns its inputs while filling (training.py:42-65)
        fake_scores = models["td"](fakes)
        real_scores = models["td"](to_torch(batches.d_shoemarks))
        real_loss = torch.nn.functional.mse_loss(
            real_scores, torch.ones_like(real_scores)
        )
        fake_loss = torch.nn.functional.mse_loss(
            fake_scores, torch.zeros_like(fake_scores)
        )
        ref_loss_val = (real_loss + fake_loss) / 2
        sign_real = torch.sign(real_scores * 2 - 1).mean()
        sign_fake = torch.sign(fake_scores * 2 - 1).mean() * -1
    close(dm["disc_loss"], ref_loss_val.item(), rtol=1e-4)
    close(dm["disc_real_acc"], sign_real.item(), rtol=1e-4)
    close(dm["disc_fake_acc"], sign_fake.item(), rtol=1e-4)


def test_g_step_loss_terms_parity(models, step_setup):
    """Every loss term of one fixed-draw generator step (training.py:136-257)
    against the reference models + the reference's own loss functions
    (src/model/loss.py), fed identical z/theta/h draws."""
    from one_to_many_gan_tpu.models import sample_style_rngs

    opt = step_setup["config"]["optimisation"]
    gran_lo, gran_hi = opt["path_loss_jacobian_granularity"]
    n_blocks = models["n_blocks"]
    rng = jax.random.key(7)
    batches = _draw_batches(jax.random.key(8))
    _, gm = step_setup["g"](
        step_setup["state"], batches, rng, jnp.zeros(())
    )

    # reproduce g_phase's draw layout: keys[4]=theta, [5]=h, [7]=w_t, [9]=w_path
    keys = jax.random.split(rng, 10)
    theta = np.asarray(jax.random.uniform(keys[4], (BATCH,)))
    fin_h = np.asarray(
        jax.random.uniform(keys[5], (BATCH,), minval=gran_lo, maxval=gran_hi)
    )
    rngs_t = sample_style_rngs(keys[7], BATCH, W_DIM, n_blocks, 0.9)
    rngs_p = sample_style_rngs(keys[9], BATCH, W_DIM, n_blocks, 0.9)

    prints = to_torch(batches.g_shoeprints)
    marks = to_torch(batches.g_shoemarks)
    tg, td, ts, tm = models["tg"], models["td"], models["ts"], models["tm"]
    with torch.no_grad():
        combined = torch.cat([prints, marks], dim=0)
        latents = tg.encode(combined)
        kl = ref_loss.kl_loss_func(latents)
        print_lat, mark_lat = latents.chunk(2, dim=0)

        w0 = torch.zeros((n_blocks, BATCH, W_DIM))
        recon = tg.decode(print_lat, w0)
        rec = torch.nn.functional.l1_loss(recon, prints)

        mark_w = ts(marks)
        idt_img = tg.decode(mark_lat, mark_w.expand(n_blocks, *mark_w.shape))
        idt = torch.nn.functional.l1_loss(idt_img, marks)

        w_t = _torch_style_stack(tm, rngs_t, n_blocks)  # domain=1
        generated = tg.decode(print_lat, w_t)
        scores = td(generated)  # ADA identity at p=0
        gan = torch.nn.functional.mse_loss(scores, torch.ones_like(scores))

        rec_w = ts(generated)
        style = ref_loss.style_cycle_loss_func(w_t[-1], rec_w)

        h_t = torch.from_numpy(fin_h.copy())
        th = torch.from_numpy(theta.copy())
        d1 = (th + h_t / 2).clamp(0, 1)
        d2 = (th - h_t / 2).clamp(0, 1)
        s_path = _torch_style_stack(tm, rngs_p, n_blocks)
        w1 = s_path * d1.view(1, -1, 1)
        w2 = s_path * d2.view(1, -1, 1)
        f1 = tg.extract(print_lat.clone(), w1)
        f2 = tg.extract(print_lat.clone(), w2)
        path = ref_loss.path_loss_func(f1, f2, h_t)

        total = (
            gan
            + opt["identity_loss_lambda"] * idt
            + opt["reconstruction_loss_lambda"] * rec
            + opt["kl_loss_lambda"] * kl
            + opt["path_loss_lambda"] * path
            + opt["style_cycle_loss_lambda"] * style
        )

    close(gm["kl_loss"], kl.item(), rtol=2e-4)
    close(gm["reconstruction_loss"], rec.item(), rtol=2e-4)
    close(gm["identity_loss"], idt.item(), rtol=2e-4)
    close(gm["gan_loss"], gan.item(), rtol=2e-4)
    close(gm["style_loss"], style.item(), rtol=2e-4)
    close(gm["path_loss"], path.item(), rtol=2e-4)
    close(gm["total_gen_loss"], total.item(), rtol=2e-4)


def test_style_vector_with_mixing(models):
    """style_vector vs the reference's _get_style_vector (builder.py:106-132)
    fed identical z draws and mixing decisions, both branches."""
    from one_to_many_gan_tpu.models import StyleRngs

    n_blocks = models["n_blocks"]
    z1 = np.asarray(jax.random.normal(jax.random.key(9), (BATCH, W_DIM)))
    z2 = np.asarray(jax.random.normal(jax.random.key(10), (BATCH, W_DIM)))
    with torch.no_grad():
        s1 = models["tm"](torch.from_numpy(z1.copy()))
        s2 = models["tm"](torch.from_numpy(z2.copy()))
    for mix, crossover in ((False, 0), (True, 0), (True, 2), (True, n_blocks - 1)):
        rngs = StyleRngs(
            z1=jnp.asarray(z1),
            z2=jnp.asarray(z2),
            mix=jnp.asarray(mix),
            crossover=jnp.asarray(crossover, jnp.int32),
        )
        ours = models["jm"].apply(
            models["pm"], rngs, n_blocks, method="style_vector"
        )
        # reference semantics: blocks [0, crossover) take s1, rest s2
        if mix:
            ref = torch.cat(
                [
                    s1[None].expand(crossover, -1, -1),
                    s2[None].expand(n_blocks - crossover, -1, -1),
                ],
                dim=0,
            )
        else:
            ref = s1[None].expand(n_blocks, -1, -1)
        close(ours, t2n(ref))
