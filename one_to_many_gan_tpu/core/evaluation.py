"""Evaluation & observability: logger, image grids, FID/KID validation.

Mirrors the reference's evaluation module contracts
(src/core/evaluation.py): the same 11 tracked scalar series and log-line
format (:269-308), the 9x8 translation grid and 5x8 decoding grid
(:122-221), and the FID/KID validation pass over generated images
(:23-80). Differences, deliberate:

- generated validation images are denormalized from [-1,1] before saving
  (the reference passes [-1,1] tensors to torchvision save_image, which
  clamps the negative half — an accidental lossy save);
- the val log line is appended to ``<run>/log`` (the reference tries to
  open its ``<run>/log`` *directory path* variant — latent bug noted in
  SURVEY.md §2 item 20);
- FID/KID come from metrics/ (pluggable extractor) instead of clean-fid;
- REALS PROTOCOL: the Trainer passes the dataset-resized uint8 array as
  the real side, so reals go through the loader's PIL-bilinear resize
  once, then the extractor's own 299-bicubic. The reference hands
  clean-fid the raw shoemark *train directory* (original files,
  clean-fid's bicubic from the originals;
  reference src/core/evaluation.py:64-69). Identical images on both
  sides of the comparison within a run; absolute numbers against an
  external clean-fid run require feeding the original directory
  (``real_images=None`` falls back to exactly that);
- every FID line is tagged with the extractor name in metrics.jsonl and
  the text log, so random-projection (relative-only) numbers cannot be
  mistaken for Inception FID.

The 1->N sweep in ``image_checkpoint`` runs as ONE batched decode per
source (the reference's ``.expand(8, ...)`` trick, made explicit).
"""

from __future__ import annotations

import math
from pathlib import Path

import jax
import numpy as np

from one_to_many_gan_tpu.config import Config
from one_to_many_gan_tpu.core.state import Models, TrainState, eval_params_g
from one_to_many_gan_tpu.models import apply_domain, sample_style_rngs


class Logger:
    """Accumulate per-step scalars; emit mean-summary lines.

    Identical series set and format string to the reference Logger
    (evaluation.py:269-308).
    """

    SERIES = (
        "total_disc_losses",
        "disc_real_accs",
        "disc_fake_accs",
        "total_gen_losses",
        "gan_losses",
        "idt_losses",
        "rec_losses",
        "kl_losses",
        "path_losses",
        "style_losses",
        "ada_ps",
    )

    def __init__(self, training_steps: int):
        self.training_steps = training_steps
        self.initialise_trackers()

    def initialise_trackers(self):
        self._data: dict[str, list] = {name: [] for name in self.SERIES}

    def append_metrics(self, metrics: dict):
        """Append one fused-step (or K-stacked multi-step) metrics dict.

        Values stay ON DEVICE — shape [] scalars or [K] stacks. No
        device->host transfer happens here; ``print`` pulls everything in
        ONE ``jax.device_get`` per log interval (a per-scalar ``float()``
        would cost 11 x interval round-trips through the host tunnel).
        """
        m = metrics
        pairs = {
            "total_disc_losses": m["disc_loss"],
            "disc_real_accs": m["disc_real_acc"],
            "disc_fake_accs": m["disc_fake_acc"],
            "total_gen_losses": m["total_gen_loss"],
            "gan_losses": m["gan_loss"],
            "idt_losses": m["identity_loss"],
            "rec_losses": m["reconstruction_loss"],
            "kl_losses": m["kl_loss"],
            "path_losses": m["path_loss"],
            "style_losses": m["style_loss"],
            "ada_ps": m["ada_p"],
        }
        for key, value in pairs.items():
            self._data[key].append(value)

    def print(self, step: int) -> str:
        return self.summary(step)[0]

    def summary(self, step: int) -> tuple[str, dict[str, float]]:
        """Emit the reference-format log line AND the interval means as a
        dict (for structured sinks: metrics.jsonl, TensorBoard adapters).
        Resets the trackers."""
        host = jax.device_get(self._data)  # ONE host pull for all series
        mean = {
            k: float(np.mean(np.concatenate([np.atleast_1d(x) for x in v])))
            for k, v in host.items()
        }
        string = (
            f"Step: {step}/{self.training_steps}, "
            f"D loss: {mean['total_disc_losses']:.6g}, "
            f"D real/fake acc: {mean['disc_real_accs']:.6g}"
            f"/{mean['disc_fake_accs']:.6g}, "
            f"Total G loss: {mean['total_gen_losses']:.6g}, "
            f"Gan loss {mean['gan_losses']:.6g}, "
            f"Idt loss {mean['idt_losses']:.6g}, "
            f"Rec loss {mean['rec_losses']:.6g}, "
            f"KL loss {mean['kl_losses']:.6g}, "
            f"Path loss {mean['path_losses']:.6g}, "
            f"Style loss: {mean['style_losses']:.6g}, "
            f"ADA: {mean['ada_ps']:.6g}, "
        )
        self.initialise_trackers()
        return string, mean


def to_display(img: np.ndarray) -> np.ndarray:
    """Per-image min-max normalize to [0,1] (reference save_grid, :94-98)."""
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo + 1e-12)


def save_grid(
    columns: list[list[np.ndarray]], save_path: Path | str, grid_size: tuple[int, int]
) -> None:
    """Save a grid of images; ``columns`` is column-major like the reference
    (evaluation.py:86-119): columns[c][r] is the image at (row r, col c)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    rows, cols = grid_size
    fig, axes = plt.subplots(nrows=rows, ncols=cols, figsize=(cols, rows))
    for r in range(rows):
        for c in range(cols):
            ax = axes[r, c] if rows > 1 and cols > 1 else axes[max(r, c)]
            ax.imshow(to_display(np.asarray(columns[c][r]).squeeze(-1)), cmap="gray")
            ax.set_axis_off()
    plt.subplots_adjust(wspace=0.1, hspace=0.1)
    fig.savefig(save_path, dpi=300, bbox_inches="tight")
    plt.close(fig)


def _run_dir(config: Config) -> Path:
    return config["training"]["checkpoint_directory"] / config["training"]["training_run"]


def _gather(iterator, n: int) -> np.ndarray:
    """Draw batches until n samples are collected (evaluation.py:149-166)."""
    chunks = []
    total = 0
    while total < n:
        b = next(iterator)
        chunks.append(b)
        total += b.shape[0]
    return np.concatenate(chunks)[:n]


def image_checkpoint(
    step: int,
    config: Config,
    models: Models,
    state: TrainState,
    shoeprint_iter,
    shoemark_iter,
    rng: jax.Array,
) -> None:
    """Save the 9x8 translation grid and 5x8 decoding grid."""
    import jax.numpy as jnp

    gen, mapping, extractor = models.generator, models.mapping, models.extractor
    # EMA generator weights when enabled (what EMA is for); the mapping
    # network and style extractor have no EMA (only G is tracked).
    params_g = eval_params_g(state)
    n_blocks, w_dim = models.n_style_blocks, models.w_dim
    out_dir = _run_dir(config) / "images"
    out_dir.mkdir(parents=True, exist_ok=True)

    prints = jnp.asarray(_gather(shoeprint_iter, 8))
    marks = jnp.asarray(_gather(shoemark_iter, 8))

    rngs = sample_style_rngs(rng, 8, w_dim, n_blocks, 0.0)
    w = apply_domain(
        mapping.apply(state.params_m, rngs, n_blocks, mix_styles=False,
                      method="style_vector"),
        1.0,
    )

    print_latents = gen.apply(params_g, prints, method="encode")
    mark_latents = gen.apply(params_g, marks, method="encode")

    # Translation grid: per column, ONE source x 8 styles in one decode.
    columns = []
    for col in range(8):
        latent_n = jnp.broadcast_to(
            print_latents[col][None], (8, *print_latents.shape[1:])
        )
        sweep = np.asarray(gen.apply(params_g, latent_n, w, method="decode"))
        columns.append([np.asarray(prints[col]), *list(sweep)])
    save_grid(columns, out_dir / f"translation_{step + 1}.png", (9, 8))

    # Decoding grid.
    w0 = jnp.zeros((n_blocks, 8, w_dim), jnp.float32)
    recon_prints = np.asarray(
        gen.apply(params_g, print_latents, w0, method="decode")
    )
    mark_w = extractor.apply(state.params_s, marks)
    mark_w_stack = jnp.broadcast_to(mark_w[None], (n_blocks, *mark_w.shape))
    recon_marks = np.asarray(
        gen.apply(params_g, mark_latents, mark_w_stack, method="decode")
    )
    translated = np.asarray(
        gen.apply(params_g, print_latents, mark_w_stack, method="decode")
    )
    decoding = [
        [
            np.asarray(prints[c]),
            recon_prints[c],
            translated[c],
            np.asarray(marks[c]),
            recon_marks[c],
        ]
        for c in range(8)
    ]
    save_grid(decoding, out_dir / f"decoding_{step + 1}.png", (5, 8))


def val_checkpoint(
    step: int,
    config: Config,
    models: Models,
    state: TrainState,
    shoeprint_val_iter,
    rng: jax.Array,
    *,
    real_images: np.ndarray | None = None,
    reals_cache: dict | None = None,
) -> tuple[float, float]:
    """Generate n_evaluation_images at θ=1 (no mixing), save PNGs, compute
    FID/KID vs the shoemark train set, append the log line.

    ``reals_cache``: pass a (per-run) dict to reuse the real-side features
    across checkpoints — the reals never change within a run, and the
    extractor pass over them is the expensive half of FID. Features are
    computed ONCE per image set here and shared between FID and KID
    (clean-fid recomputes per metric).
    """
    import jax.numpy as jnp
    from PIL import Image

    from one_to_many_gan_tpu.metrics import default_extractor
    from one_to_many_gan_tpu.metrics.fid import (
        _load_dir,
        compute_stats,
        frechet_distance,
        kernel_distance,
    )

    gen, mapping = models.generator, models.mapping
    params_g = eval_params_g(state)  # EMA weights when enabled
    n_blocks, w_dim = models.n_style_blocks, models.w_dim
    val_dir = _run_dir(config) / "val"
    val_dir.mkdir(parents=True, exist_ok=True)

    n_eval = config["evaluation"]["n_evaluation_images"]
    batch = config["evaluation"]["inference_batch_size"]

    @jax.jit
    def translate(params_g, params_m, images, key):
        rngs = sample_style_rngs(key, images.shape[0], w_dim, n_blocks, 0.0)
        w = apply_domain(
            mapping.apply(params_m, rngs, n_blocks, mix_styles=False,
                          method="style_vector"),
            1.0,
        )
        return gen.apply(params_g, images, w)

    generated = []
    i = 0
    for it in range(math.ceil(n_eval / batch)):
        images = jnp.asarray(next(shoeprint_val_iter))
        key = jax.random.fold_in(rng, it)
        out = np.asarray(translate(params_g, state.params_m, images, key))
        out_u8 = np.clip((out + 1.0) * 127.5, 0, 255).astype(np.uint8)
        for img in out_u8:
            Image.fromarray(img.squeeze(-1)).save(val_dir / f"{i}.png")
            i += 1
        generated.append(out_u8)
    generated = np.concatenate(generated)[:n_eval]

    # tpu.require_inception_fid: a run whose FID must be comparable to the
    # reference protocol hard-fails here rather than silently logging a
    # relative-only random-projection number (metrics/fid.py).
    extractor, extractor_name = default_extractor(
        require_inception=config["tpu"]["require_inception_fid"]
    )
    gen_feats = extractor(generated)
    if reals_cache is not None and extractor_name in reals_cache:
        real_feats = reals_cache[extractor_name]
    else:
        reals = (
            real_images
            if real_images is not None
            else _load_dir(config["data"]["shoemark_data_dir"] / "train")
        )
        real_feats = extractor(reals)
        if reals_cache is not None:
            reals_cache[extractor_name] = real_feats
    fid_score = frechet_distance(
        compute_stats(gen_feats), compute_stats(real_feats)
    )
    kid_score = kernel_distance(
        gen_feats, real_feats, subset_size=min(1000, n_eval)
    )

    # The extractor tag rides every sink: random_projection_* numbers are
    # valid for relative tracking only and must never be read as
    # Inception FID (metrics/fid.py).
    log = f"Step {step + 1} | fid: {fid_score}, kid: {kid_score} [{extractor_name}]"
    print(log)
    run_dir = _run_dir(config)
    run_dir.mkdir(parents=True, exist_ok=True)
    with (run_dir / "log").open("a") as f:
        f.write(log + "\n")
    import json

    with (run_dir / "metrics.jsonl").open("a") as f:
        f.write(
            json.dumps(
                {
                    "step": step + 1,
                    "fid": fid_score,
                    "kid": kid_score,
                    "fid_extractor": extractor_name,
                }
            )
            + "\n"
        )
    return fid_score, kid_score
