"""The fused train step: D update + G update + ADA + buffer in ONE XLA program.

The reference runs two sequential optimizer steps per loop iteration with
host round-trips between them (train.py:204-251 calling
training.py:71-128 then :136-257). Here both updates — plus the ADA
controller and the replay buffer — compile into a single jitted function
per step, preserving the reference's ordering semantics exactly:

- the augmentation probability used by BOTH sub-steps of iteration t is
  the controller value entering the iteration (train.py:206);
- the D update sees fakes from the CURRENT generator through the replay
  buffer (training.py:91-108); ``stop_gradient`` replaces ``.detach()``;
- the G update sees the UPDATED discriminator (train.py:210-244 ordering);
- the G update consumes FRESH data batches (training.py:155-156);
- the generator/mapping/style-extractor gradients come from one joint
  backward over the six-term loss (training.py:236-248).

RNG is an explicit key; every stochastic site (style z's, mixing draws,
buffer swaps, ADA transforms, θ and h) draws from named splits.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from one_to_many_gan_tpu import losses
from one_to_many_gan_tpu.augment import augment, make_ada_update
from one_to_many_gan_tpu.config import Config
from one_to_many_gan_tpu.core.buffer import buffer_apply
from one_to_many_gan_tpu.core.state import Models, TrainState, make_optimizers
from one_to_many_gan_tpu.models import StyleRngs, apply_domain, sample_style_rngs


class Batches(NamedTuple):
    """The four data batches one fused step consumes (NHWC, [-1,1] float32)."""

    d_shoeprints: jax.Array
    d_shoemarks: jax.Array
    g_shoeprints: jax.Array
    g_shoemarks: jax.Array


def batch_pack(xs, axis: int = 0):
    """Concatenate along the batch axis in SHARD-LOCAL order.

    ``jnp.concatenate(xs, 0)`` places each input's full global batch
    contiguously, so under data sharding every chip's output shard draws
    from other chips' input shards and the SPMD partitioner moves whole
    activations over ICI (measured 7.8 GB/chip/step of collective-permute
    at the 256² dp=8 point — scripts/collective_budget.py). Stacking on a
    new axis MINOR to batch and merging instead puts row ``k*len(xs)+j``
    = input j's sample k: every chip's output shard is exactly its own
    input rows, a local reshape with zero communication. The batched
    networks (decoder/discriminator/extractor) are strictly per-sample,
    so batch order is mathematically invisible; ``batch_unpack`` restores
    the original tensors exactly (same rows, same order — only the fused
    pass's internal layout changes, plus reassociation of any reduction
    computed on the packed tensor, e.g. the KL batch statistics).
    """
    stacked = jnp.stack(xs, axis=axis + 1)
    return stacked.reshape(
        (*stacked.shape[:axis], -1, *stacked.shape[axis + 2 :])
    )


def batch_unpack(x, n: int, axis: int = 0):
    """Inverse of ``batch_pack``: split ``n`` interleaved groups back out."""
    r = x.reshape((*x.shape[:axis], -1, n, *x.shape[axis + 1 :]))
    return tuple(jnp.take(r, j, axis=axis + 1) for j in range(n))


def make_phase_fns(config: Config, models: Models, mesh=None):
    """Build the two optimizer updates as separate pure functions.

        d_phase(state, batches, rng)         -> (state, d_metrics)
        g_phase(state, batches, rng, p_used) -> (state, g_metrics)

    ``make_train_step`` composes them into the fused single-program step;
    ``tpu.split_phases`` runs them as two separate jitted programs (the
    512² memory lever: each program's live-activation peak is its own
    phase's, enabling larger batches without remat — BASELINE.md).
    Both phases derive the SAME ``jax.random.split(rng, 10)`` layout (D
    consumes keys 0-3, G keys 4-9), so split and fused execution are
    bit-identical. ``p_used`` is the ADA probability ENTERING the
    iteration (the reference sets it once for both sub-steps,
    train.py:206); d_phase reports it as ``d_metrics["ada_p"]``.

    ``mesh``: the active device mesh, if any. Only the batch-sequential
    ops need it (the shard_map'd Pallas/XLA ADA warp, the buffer's
    all-gather-once path); every other op is written on global arrays
    and partitioned by XLA's SPMD pass.
    """
    if getattr(models, "int8_decode", False):
        # int8 convs round() their operands — no gradient flows through
        # the decoder. The int8 model variant is serving/eval-only.
        msg = "int8_decode models cannot train; build Models(config) instead"
        raise ValueError(msg)
    opt_cfg = config["optimisation"]
    ada_cfg = config["ada"]
    train_cfg = config["training"]
    arch_cfg = config["architecture"]
    tpu_cfg = config["tpu"]

    opts = make_optimizers(config)
    ada_update = make_ada_update(
        ada_cfg["ada_overfitting_measurement_n_images"],
        ada_cfg["ada_adjustment_size"],
        train_cfg["batch_size"],
        ada_cfg["discriminator_real_acc_target"],
    )
    mixing_prob = train_cfg["style_mixing_prob"]
    n_blocks = models.n_style_blocks
    w_dim = models.w_dim
    gran_lo, gran_hi = opt_cfg["path_loss_jacobian_granularity"]
    add_latent_noise = arch_cfg["add_latent_noise"]
    ema_decay = tpu_cfg["ema_decay"]
    r1_gamma = tpu_cfg["r1_gamma"]
    r1_interval = tpu_cfg["r1_interval"]
    ada_antialias = tpu_cfg["ada_antialias"]
    ada_pallas = tpu_cfg["ada_pallas"]
    ada_supersample = tpu_cfg["ada_supersample"]
    # ADA runs in the activation dtype: its output only ever feeds the
    # (bf16) discriminator, and its warp contraction halves its HBM
    # intermediates under bf16 (augment/pipeline.py; tent weights and
    # accumulation stay f32 inside).
    aug_dtype = (
        jnp.bfloat16 if tpu_cfg["precision"] == "bfloat16" else jnp.float32
    )

    gen, disc, mapping, extractor = (
        models.generator,
        models.discriminator,
        models.mapping,
        models.extractor,
    )

    # Optional rematerialization (tpu.remat, see config.py):
    #   "full" — jax.checkpoint every model pass (recompute whole forwards);
    #   "conv" — save only checkpoint_name-tagged conv outputs and recompute
    #            the cheap elementwise chains (IN, ReLU, pad, FIR resamples)
    #            between them in the backward. The G loss traverses the
    #            decoder 5x + encoder + extractor 2x; "conv" cuts its
    #            activation footprint severalfold for a few % extra
    #            bandwidth-bound FLOPs — the knob that unlocks the larger,
    #            MXU-friendlier batches measured in BASELINE.md.
    def _make_ckpt(mode: str):
        if mode == "full":
            return jax.checkpoint
        if mode == "conv":
            from jax.ad_checkpoint import checkpoint_policies

            def ckpt(f):
                return jax.checkpoint(
                    f,
                    policy=checkpoint_policies.save_only_these_names("conv_out"),
                )

            return ckpt
        return lambda f: f

    remat_g_mode = tpu_cfg["remat"]
    remat_d_mode = tpu_cfg["remat_d"]
    if remat_d_mode == "same":
        remat_d_mode = remat_g_mode
    ckpt = _make_ckpt(remat_g_mode)  # G phase (the ~11-pass backward)
    ckpt_d = _make_ckpt(remat_d_mode)  # D phase (one D backward)

    gen_encode = ckpt(lambda p, img: gen.apply(p, img, method="encode"))
    gen_decode = ckpt(lambda p, z, ws: gen.apply(p, z, ws, method="decode"))
    gen_extract = ckpt(lambda p, z, ws: gen.apply(p, z, ws, method="extract"))
    ext_apply = ckpt(lambda p, img: extractor.apply(p, img))
    disc_apply = ckpt(lambda p, img: disc.apply(p, img))
    disc_apply_d = ckpt_d(lambda p, img: disc.apply(p, img))

    def sample_w(params_m, rng, batch, domain, *, mix=True):
        rngs = sample_style_rngs(rng, batch, w_dim, n_blocks, mixing_prob)
        s = mapping.apply(params_m, rngs, n_blocks, mix_styles=mix,
                          method="style_vector")
        return apply_domain(s, domain)

    def d_phase(
        state: TrainState, batches: Batches, rng: jax.Array
    ) -> tuple[TrainState, dict[str, jax.Array]]:
        batch = batches.d_shoeprints.shape[0]
        keys = jax.random.split(rng, 10)
        p_used = state.ada.p
        w_d = sample_w(state.params_m, keys[0], batch, 1.0)
        fakes = gen.apply(state.params_g, batches.d_shoeprints, w_d)
        fakes = jax.lax.stop_gradient(fakes.astype(jnp.float32))
        buffered, buffer_state = buffer_apply(state.buffer, fakes, keys[1], mesh)
        aug_fake = augment(
            buffered.astype(aug_dtype), p_used, keys[2],
            antialias=ada_antialias, pallas=ada_pallas,
            supersample=ada_supersample, mesh=mesh,
        )
        aug_real = augment(
            batches.d_shoemarks.astype(aug_dtype),
            p_used,
            keys[3],
            antialias=ada_antialias,
            pallas=ada_pallas,
            supersample=ada_supersample,
            mesh=mesh,
        )

        def d_loss_fn(params_d):
            # One batched D pass over the interleaved [fake; real] batch:
            # the discriminator has no cross-batch ops (per-sample IN,
            # convs), so scoring the packed batch is per-sample identical
            # to two passes (training.py:107-108) while doubling the MXU
            # batch; shard-local packing keeps it communication-free
            # under data sharding (batch_pack docstring).
            scores = disc_apply_d(
                params_d, batch_pack([aug_fake, aug_real])
            ).astype(jnp.float32)
            fake_scores, real_scores = batch_unpack(scores, 2)
            loss = losses.lsgan_d_loss(real_scores, fake_scores)
            return loss, (real_scores, fake_scores)

        (d_loss, (real_scores, fake_scores)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.params_d)

        if r1_gamma > 0:
            # Lazy regularization: the R1 double-backward runs only every
            # r1_interval steps — lax.cond executes ONE branch at runtime,
            # so off-interval steps genuinely skip the compute (the point of
            # lazy regularization; jnp.where would pay it every step).
            def r1_branch(params_d):
                # The penalty differentiates D w.r.t. the IMAGES and squares
                # the result — compute it on f32 inputs even when the augment
                # pipe runs bf16 (squaring bf16-rounded gradients loses real
                # precision; the lazy interval makes the extra cost nil).
                r1_real = aug_real.astype(jnp.float32)
                loss_p, grads_p = jax.value_and_grad(
                    lambda p: (r1_gamma / 2.0)
                    * losses.r1_penalty(disc.apply, p, r1_real)
                )(params_d)
                return loss_p, grads_p

            def zero_branch(params_d):
                return jnp.zeros(()), jax.tree.map(jnp.zeros_like, params_d)

            r1_loss, r1_grads = jax.lax.cond(
                (state.step % r1_interval) == 0,
                r1_branch,
                zero_branch,
                state.params_d,
            )
            d_loss = d_loss + r1_loss
            d_grads = jax.tree.map(jnp.add, d_grads, r1_grads)
        d_updates, opt_d = opts["d"].update(d_grads, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, d_updates)

        sign_real = losses.discriminator_confidence(real_scores)
        sign_fake = -losses.discriminator_confidence(fake_scores)
        ada_state = ada_update(state.ada, sign_real)
        new_state = state.replace(
            params_d=params_d, opt_d=opt_d, ada=ada_state, buffer=buffer_state
        )
        return new_state, {
            "disc_loss": d_loss,
            "disc_real_acc": sign_real,
            "disc_fake_acc": sign_fake,
            "ada_p": p_used,
        }

    g_loss_split = tpu_cfg["g_loss_split"]
    path_interval = tpu_cfg["path_interval"]
    # Lazy path-length regularization (StyleGAN2's lazy-regularization
    # trick, same pattern as R1 above): the path term — a 2B decoder
    # extract forward+backward every step in the reference
    # (src/core/training.py:212-234) — runs only every path_interval
    # steps with λ scaled by the interval, so the time-averaged
    # regularization pressure is unchanged. Implemented as a separate
    # accumulated sub-backward (the g_loss_split structure, exact up to
    # float reassociation) wrapped in lax.cond so off-interval steps
    # genuinely skip the whole encode+extract program.
    lazy_path = path_interval > 1

    def g_phase(
        state: TrainState, batches: Batches, rng: jax.Array, p_used: jax.Array
    ) -> tuple[TrainState, dict[str, jax.Array]]:
        batch = batches.g_shoeprints.shape[0]
        keys = jax.random.split(rng, 10)  # same layout as d_phase; G uses 4-9
        theta = jax.random.uniform(keys[4], (batch,))
        fin_diff_h = jax.random.uniform(
            keys[5], (batch,), minval=gran_lo, maxval=gran_hi
        )
        d1 = jnp.clip(theta + fin_diff_h / 2.0, 0.0, 1.0)
        d2 = jnp.clip(theta - fin_diff_h / 2.0, 0.0, 1.0)

        def encode_latents(params_g):
            combined = batch_pack([batches.g_shoeprints, batches.g_shoemarks])
            latents = gen_encode(params_g, combined)
            kl = losses.kl_loss(latents)
            if add_latent_noise:
                # same key either way: the split legs must see the SAME
                # noise draw the fused backward sees
                latents = latents + jax.random.normal(
                    keys[6], latents.shape, latents.dtype
                )
            print_latent, mark_latent = batch_unpack(latents, 2)
            return print_latent, mark_latent, kl

        def main_terms(print_latent, mark_latent, kl, params_g, params_m, params_s):
            """All loss terms except path: kl + rec + idt + gan + style."""
            # The decoder is strictly per-sample (modulated convs, per-block
            # style routing, no cross-batch statistics), so the reference's
            # three sequential decodes (reconstruction θ=0 / identity with
            # the extracted shoemark style / θ=1 translation,
            # training.py:171-204) run here as ONE decode at 3x batch —
            # identical math per sample, fewer and larger MXU kernels.
            w0 = jnp.zeros((n_blocks, batch, w_dim), jnp.float32)
            mark_w = ext_apply(params_s, batches.g_shoemarks)
            mark_w_stack = jnp.broadcast_to(mark_w[None], (n_blocks, *mark_w.shape))
            w_t = sample_w(params_m, keys[7], batch, 1.0)

            lat3 = batch_pack([print_latent, mark_latent, print_latent])
            w3 = batch_pack([w0, mark_w_stack, w_t], axis=1)
            out3 = gen_decode(params_g, lat3, w3)
            recon, idt, generated = batch_unpack(out3, 3)

            rec_loss = losses.l1_loss(
                recon.astype(jnp.float32), batches.g_shoeprints
            )
            idt_loss = losses.l1_loss(
                idt.astype(jnp.float32), batches.g_shoemarks
            )

            # GAN: augment the translations, score with the UPDATED D.
            aug_gen = augment(
                generated.astype(aug_dtype), p_used, keys[8],
                antialias=ada_antialias, pallas=ada_pallas,
                supersample=ada_supersample, mesh=mesh,
            )
            # scores from the UPDATED discriminator (state.params_d here)
            gen_scores = disc_apply(state.params_d, aug_gen).astype(jnp.float32)
            gan = losses.lsgan_g_loss(gen_scores)

            # Style cycle: re-extract the style from the fakes.
            rec_w = ext_apply(params_s, generated)
            style = losses.style_cycle_loss(w_t[-1], rec_w)

            total = (
                gan
                + opt_cfg["identity_loss_lambda"] * idt_loss
                + opt_cfg["reconstruction_loss_lambda"] * rec_loss
                + opt_cfg["kl_loss_lambda"] * kl
                + opt_cfg["style_cycle_loss_lambda"] * style
            )
            aux = {
                "gan_loss": gan,
                "reconstruction_loss": rec_loss,
                "identity_loss": idt_loss,
                "kl_loss": kl,
                "style_loss": style,
            }
            return total, aux

        def path_term(print_latent, params_g, params_m):
            """The θ-path-length term: finite difference through the decoder
            taps. Both finite-difference legs (training.py:226-233) batch
            into one extract at 2x batch."""
            w_path = sample_w(params_m, keys[9], batch, 1.0)
            w1 = apply_domain(w_path, d1)
            w2 = apply_domain(w_path, d2)
            lat2 = batch_pack([print_latent, print_latent])
            w12 = batch_pack([w1, w2], axis=1)
            f12 = gen_extract(params_g, lat2, w12)
            legs = [batch_unpack(f, 2) for f in f12]
            f1 = [a for a, _ in legs]
            f2 = [b for _, b in legs]
            path = losses.path_loss(f1, f2, fin_diff_h)
            return opt_cfg["path_loss_lambda"] * path, path

        if lazy_path and not g_loss_split:
            # Joint-cond lazy path (the fast structure, measured
            # BASELINE.md round 5): the WHOLE six-term joint backward sits
            # in the on-branch with the path weight scaled by the
            # interval — on-steps run the exact anchor program (encoder
            # shared between main and path terms, no recomputation), and
            # off-steps run a main-only joint backward that never builds
            # the 2B extract at all. The two-sub-backward structure below
            # (g_loss_split + lazy) pays an extra 2B encode forward on
            # every on-step; this form doesn't, so it strictly dominates
            # whenever memory permits the joint backward.
            scale = float(path_interval)

            def loss_with_path(params_g, params_m, params_s):
                pl, ml, kl = encode_latents(params_g)
                total_main, aux = main_terms(
                    pl, ml, kl, params_g, params_m, params_s
                )
                path_weighted, path_raw = path_term(pl, params_g, params_m)
                return total_main + path_weighted * scale, (aux, path_raw)

            def loss_main_only(params_g, params_m, params_s):
                pl, ml, kl = encode_latents(params_g)
                total_main, aux = main_terms(
                    pl, ml, kl, params_g, params_m, params_s
                )
                return total_main, (aux, jnp.zeros(()))

            def _branch(loss_fn):
                def run(operand):
                    pg, pm, ps = operand
                    (total, (aux, praw)), grads = jax.value_and_grad(
                        loss_fn, argnums=(0, 1, 2), has_aux=True
                    )(pg, pm, ps)
                    return total, aux, praw, grads

                return run

            total_g, aux, path_raw, (g_grads, m_grads, s_grads) = jax.lax.cond(
                (state.step % path_interval) == 0,
                _branch(loss_with_path),
                _branch(loss_main_only),
                (state.params_g, state.params_m, state.params_s),
            )
            aux = {**aux, "path_loss": path_raw}
        elif g_loss_split or lazy_path:
            # tpu.g_loss_split: grads of a sum = sum of grads, so the
            # six-term backward splits into TWO accumulated sub-backwards —
            # {kl,rec,idt,gan,style} (encode + 3B decode + D + extractor)
            # and {path} (encode + 2B extract). Each sub-program's
            # live-activation peak is a fraction of the joint backward's,
            # at the price of one extra encoder forward — the 512² memory
            # lever on top of split_phases (VERDICT r3 #4). Exact up to
            # float reassociation of the gradient sums. The same structure
            # carries lazy path regularization (tpu.path_interval): the
            # path sub-backward is wrapped in lax.cond so off-interval
            # steps skip its compute entirely, and on-interval steps scale
            # the weighted term + grads by the interval (exact: scaling by
            # the grad seed commutes with autodiff).
            def leg_main(params_g, params_m, params_s):
                pl, ml, kl = encode_latents(params_g)
                return main_terms(pl, ml, kl, params_g, params_m, params_s)

            def leg_path(params_g, params_m):
                pl, _, _ = encode_latents(params_g)
                return path_term(pl, params_g, params_m)

            (main_total, aux), (g_a, m_a, s_grads) = jax.value_and_grad(
                leg_main, argnums=(0, 1, 2), has_aux=True
            )(state.params_g, state.params_m, state.params_s)
            if lazy_path:
                scale = float(path_interval)

                def path_on(operand):
                    pg, pm = operand
                    (pw, praw), (gb, mb) = jax.value_and_grad(
                        leg_path, argnums=(0, 1), has_aux=True
                    )(pg, pm)
                    gb = jax.tree.map(lambda t: t * scale, gb)
                    mb = jax.tree.map(lambda t: t * scale, mb)
                    return pw * scale, praw, gb, mb

                def path_off(operand):
                    pg, pm = operand
                    return (
                        jnp.zeros(()),
                        jnp.zeros(()),
                        jax.tree.map(jnp.zeros_like, pg),
                        jax.tree.map(jnp.zeros_like, pm),
                    )

                path_weighted, path_raw, g_b, m_b = jax.lax.cond(
                    (state.step % path_interval) == 0,
                    path_on,
                    path_off,
                    (state.params_g, state.params_m),
                )
            else:
                (path_weighted, path_raw), (g_b, m_b) = jax.value_and_grad(
                    leg_path, argnums=(0, 1), has_aux=True
                )(state.params_g, state.params_m)
            g_grads = jax.tree.map(jnp.add, g_a, g_b)
            m_grads = jax.tree.map(jnp.add, m_a, m_b)
            total_g = main_total + path_weighted
            aux = {**aux, "path_loss": path_raw}
        else:

            def g_loss_fn(params_g, params_m, params_s):
                pl, ml, kl = encode_latents(params_g)
                total_main, aux = main_terms(
                    pl, ml, kl, params_g, params_m, params_s
                )
                path_weighted, path_raw = path_term(pl, params_g, params_m)
                return total_main + path_weighted, {**aux, "path_loss": path_raw}

            (total_g, aux), (g_grads, m_grads, s_grads) = jax.value_and_grad(
                g_loss_fn, argnums=(0, 1, 2), has_aux=True
            )(state.params_g, state.params_m, state.params_s)

        g_updates, opt_g = opts["g"].update(g_grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, g_updates)
        m_updates, opt_m = opts["m"].update(m_grads, state.opt_m, state.params_m)
        params_m = optax.apply_updates(state.params_m, m_updates)
        s_updates, opt_s = opts["s"].update(s_grads, state.opt_s, state.params_s)
        params_s = optax.apply_updates(state.params_s, s_updates)

        ema_params_g = state.ema_params_g
        if ema_params_g is not None:
            ema_params_g = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema_params_g,
                params_g,
            )

        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g,
            params_m=params_m,
            params_s=params_s,
            opt_g=opt_g,
            opt_m=opt_m,
            opt_s=opt_s,
            ema_params_g=ema_params_g,
        )
        metrics = {"total_gen_loss": total_g, **aux}
        return new_state, metrics

    return d_phase, g_phase


def make_train_step(config: Config, models: Models, mesh=None):
    """The fused (state, batches, rng) -> (state, metrics) step: D update
    then G update in ONE XLA program (module docstring semantics)."""
    d_phase, g_phase = make_phase_fns(config, models, mesh)

    def train_step(
        state: TrainState, batches: Batches, rng: jax.Array
    ) -> tuple[TrainState, dict[str, jax.Array]]:
        p_used = state.ada.p
        state, d_metrics = d_phase(state, batches, rng)
        state, g_metrics = g_phase(state, batches, rng, p_used)
        return state, {**d_metrics, **g_metrics}

    return train_step


def make_multi_step(config: Config, models: Models, steps_per_call: int, mesh=None):
    """Scan ``steps_per_call`` fused steps inside ONE jitted program.

    Amortizes per-call dispatch/transfer overhead (significant on hosts far
    from the accelerator) across K steps — the standard TPU "inner loop"
    pattern. Semantics are identical to K sequential ``train_step`` calls
    with the same per-step keys: pass ``keys`` [K] (e.g. fold_in of the
    loop key at each global step) and batches stacked on a leading [K]
    axis. Returns metrics stacked [K, ...].
    """
    step = make_train_step(config, models, mesh)

    def multi_step(state: TrainState, batches: Batches, keys: jax.Array):
        def body(s, xs):
            b, key = xs
            s, metrics = step(s, b, key)
            return s, metrics

        return jax.lax.scan(body, state, (batches, keys))

    return multi_step


def make_inference_fns(config: Config, models: Models, mesh=None):
    """Pure inference entry points (translation + 1->N sweep).

    The 1->N sweep batches one encoded source against N styles in a single
    XLA call — the reference hints at this with its ``.expand(8, ...)``
    decode (evaluation.py:171-177).

    ``mesh``: optional ``jax.sharding.Mesh`` for multi-chip serving — the
    flattened style-batch axis of the decode (where the FLOPs are) is
    sharded over the mesh's data axis, so 1->N throughput scales with
    chips. Requires the style count divisible by the data-axis size;
    params should be replicated on the mesh (serve.py does both).
    """
    gen, mapping = models.generator, models.mapping
    n_blocks = models.n_style_blocks
    w_dim = models.w_dim
    mixing_prob = config["training"]["style_mixing_prob"]

    def shard_styles(x):
        """Constrain a style-major tensor's leading axis over the mesh."""
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        from one_to_many_gan_tpu.parallel.mesh import DATA_AXIS

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(DATA_AXIS))
        )

    def translate(params_g, params_m, images, rng, *, domain=1.0, mix=False):
        batch = images.shape[0]
        rngs = sample_style_rngs(rng, batch, w_dim, n_blocks, mixing_prob)
        s = mapping.apply(params_m, rngs, n_blocks, mix_styles=mix,
                          method="style_vector")
        w = apply_domain(s, domain)
        return gen.apply(params_g, images, w)

    def one_to_many(params_g, params_m, image, rng, n_styles: int, theta=1.0):
        """One source image [H,W,C] -> [n_styles, H, W, C] translations.

        ``theta`` is the continuous domain coordinate (builder.py:87-90):
        0 reproduces the source domain (zero style), 1 is the full
        shoemark domain; intermediate values interpolate.
        """
        latent = gen.apply(params_g, image[None], method="encode")
        latent_n = shard_styles(
            jnp.broadcast_to(latent, (n_styles, *latent.shape[1:]))
        )
        rngs = sample_style_rngs(rng, n_styles, w_dim, n_blocks, mixing_prob)
        s = mapping.apply(params_m, rngs, n_blocks, mix_styles=False,
                          method="style_vector")
        w = shard_styles(apply_domain(s, theta))
        return gen.apply(params_g, latent_n, w, method="decode")

    def many_to_many(params_g, params_m, images, keys, n_styles: int, thetas):
        """The cross-request serving batch: [B,H,W,C] sources, [B] typed
        rng keys and [B] thetas -> [B, n_styles, H, W, C] translations.

        One encode at B and one decode at B*n_styles — bigger MXU batches
        than serving the B requests sequentially, and one host<->device
        round trip instead of B. Request ``i``'s output depends only on
        (images[i], keys[i], thetas[i], n_styles): the per-request style
        draws are the vmap of ``one_to_many``'s, so a batched request
        equals the solo path at the same n_styles bucket (same math,
        batched execution). Serving layer: serve.py ``_Batcher``.
        """
        b = images.shape[0]
        latents = gen.apply(params_g, images, method="encode")
        latent_bn = shard_styles(jnp.repeat(latents, n_styles, axis=0))  # [B*n, ...]
        rngs = jax.vmap(
            lambda k: sample_style_rngs(k, n_styles, w_dim, n_blocks,
                                        mixing_prob)
        )(keys)
        z1 = rngs.z1.reshape(b * n_styles, w_dim)
        flat = StyleRngs(z1=z1, z2=z1, mix=jnp.asarray(False),
                         crossover=jnp.asarray(0))
        s = mapping.apply(params_m, flat, n_blocks, mix_styles=False,
                          method="style_vector")
        theta_bn = jnp.repeat(jnp.asarray(thetas, s.dtype), n_styles)
        w = shard_styles(apply_domain(s, theta_bn))
        out = gen.apply(params_g, latent_bn, w, method="decode")
        return out.reshape(b, n_styles, *out.shape[1:])

    return translate, one_to_many, many_to_many
