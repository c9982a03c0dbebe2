"""Training orchestrator: the loop around the fused step.

Replaces the reference's ``train.py:28-319`` ``main``: build models,
state, data iterators, then run ``training_steps`` fused jitted steps with
periodic logging (log_interval), image/val/model checkpoints
(checkpoint_interval).

TPU-native upgrades over the reference:
- ONE jitted program per iteration (D+G+ADA+buffer), with the TrainState
  donated — no host round-trips in the hot loop; metrics stay on device
  and are pulled only at log time.
- Orbax checkpointing WITH restore: ``tpu.resume`` auto-resumes from the
  latest checkpoint (the reference can only save, SURVEY.md §5 —
  infinite_run.sh restarts from step 0).
- optional device mesh (tpu.data_parallel/spatial_parallel) with sharded
  batches and replicated state.
- optional jax.profiler trace capture at ``tpu.profile_step``.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from one_to_many_gan_tpu.config import Config
from one_to_many_gan_tpu.core.evaluation import (
    Logger,
    image_checkpoint,
    val_checkpoint,
)
from one_to_many_gan_tpu.core.state import Models, TrainState, init_train_state
from one_to_many_gan_tpu.core.train_step import (
    Batches,
    make_multi_step,
    make_train_step,
)
from one_to_many_gan_tpu.data import BatchIterator, ShoeDataset
from one_to_many_gan_tpu.parallel import make_mesh, replicate, shard_batch


def _checkpoint_manager(config: Config):
    import orbax.checkpoint as ocp

    models_dir = (
        config["training"]["checkpoint_directory"]
        / config["training"]["training_run"]
        / "models"
    )
    models_dir.mkdir(parents=True, exist_ok=True)
    return ocp.CheckpointManager(
        models_dir.resolve(), options=ocp.CheckpointManagerOptions(max_to_keep=3)
    )


def save_checkpoint(mgr, step: int, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def restore_checkpoint(mgr, state: TrainState) -> tuple[TrainState, int]:
    """Restore the latest step if present; returns (state, start_step)."""
    import orbax.checkpoint as ocp

    latest = mgr.latest_step()
    if latest is None:
        return state, 0
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored = mgr.restore(latest, args=ocp.args.StandardRestore(abstract))
    return restored, latest


class Trainer:
    """Builds everything from config; ``run()`` executes the training loop."""

    def __init__(
        self,
        config: Config,
        *,
        shoeprint_images: np.ndarray | None = None,
        shoemark_images: np.ndarray | None = None,
        verbose: bool = True,
    ):
        self.config = config
        self.verbose = verbose
        self.models = Models(config)

        # Inner-loop length: scan K fused steps per jitted call, clamped so
        # the log/checkpoint cadences land on call boundaries.
        import math

        k = max(1, config["tpu"]["steps_per_call"])
        k = math.gcd(
            math.gcd(k, config["evaluation"]["log_interval"]),
            config["evaluation"]["checkpoint_interval"],
        )
        self.steps_per_call = k
        if k > 1:
            self.step_fn = jax.jit(
                make_multi_step(config, self.models, k), donate_argnums=0
            )
        else:
            self.step_fn = jax.jit(
                make_train_step(config, self.models), donate_argnums=0
            )

        seed = config["training"]["random_seed"]
        self.base_rng = jax.random.key(seed)
        init_rng, self.loop_rng = jax.random.split(self.base_rng)
        self.state = init_train_state(config, self.models, init_rng)

        # Mesh (single-device when the product is 1). Data parallelism is
        # clamped to the largest value dividing the batch size.
        dp = config["tpu"]["data_parallel"]
        sp = config["tpu"]["spatial_parallel"]
        n_dev = len(jax.devices())
        batch_size = config["training"]["batch_size"]
        if dp == -1:
            dp = n_dev // sp
        while dp > 1 and batch_size % dp != 0:
            dp -= 1
        self.mesh = make_mesh(dp, sp) if dp * sp > 1 else None
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)

        # Data.
        image_size = tuple(config["data"]["image_size"])
        channels = config["data"]["image_channels"]
        native = config["tpu"]["native_loader"]
        if shoeprint_images is None:
            shoeprint_images = ShoeDataset(
                config["data"]["shoeprint_data_dir"],
                mode="train",
                image_size=image_size,
                channels=channels,
                native=native,
            ).images
        if shoemark_images is None:
            shoemark_images = ShoeDataset(
                config["data"]["shoemark_data_dir"],
                mode="train",
                image_size=image_size,
                channels=channels,
                native=native,
            ).images
        self.shoemark_images = shoemark_images

        host_id = jax.process_index()
        host_count = jax.process_count()
        batch = config["training"]["batch_size"]

        def train_iter(images, offset):
            return BatchIterator(
                images,
                batch,
                shuffle=True,
                flip_prob=0.5,
                seed=seed + offset,
                host_id=host_id,
                host_count=host_count,
                native=native,
            )

        # Independent streams for the D and G sub-steps (the reference pulls
        # 2 batches per domain per iteration from one cycled loader).
        self.shoeprint_iter = train_iter(shoeprint_images, 1)
        self.shoemark_iter = train_iter(shoemark_images, 2)
        self.val_iter = BatchIterator(
            shoeprint_images,
            config["evaluation"]["inference_batch_size"],
            shuffle=False,
            flip_prob=0.0,
            seed=seed,
            host_id=host_id,
            host_count=host_count,
        )

        self.logger = Logger(config["training"]["training_steps"])
        self.ckpt_mgr = _checkpoint_manager(config)
        if config["tpu"]["resume"]:
            self.state, self.start_step = restore_checkpoint(self.ckpt_mgr, self.state)
            if self.verbose and self.start_step:
                print(f"Resumed from checkpoint at step {self.start_step}")
        else:
            self.start_step = 0

    # ------------------------------------------------------------ loop

    def _next_batches(self) -> Batches:
        b = Batches(
            d_shoeprints=next(self.shoeprint_iter),
            d_shoemarks=next(self.shoemark_iter),
            g_shoeprints=next(self.shoeprint_iter),
            g_shoemarks=next(self.shoemark_iter),
        )
        if self.mesh is not None:
            b = Batches(*(shard_batch(self.mesh, x) for x in b))
        return b

    def run(self, max_steps: int | None = None) -> TrainState:
        config = self.config
        total = config["training"]["training_steps"]
        if max_steps is not None:
            total = min(total, self.start_step + max_steps)
        log_interval = config["evaluation"]["log_interval"]
        ckpt_interval = config["evaluation"]["checkpoint_interval"]
        profile_step = config["tpu"]["profile_step"]
        run_dir = (
            config["training"]["checkpoint_directory"]
            / config["training"]["training_run"]
        )
        t0 = time.perf_counter()

        k = self.steps_per_call
        step = self.start_step
        while step < total:
            k_now = min(k, total - step)
            if profile_step and step <= profile_step < step + k_now:
                jax.profiler.start_trace(str(run_dir / "trace"))
            if k_now == 1:
                rng = jax.random.fold_in(self.loop_rng, step)
                self.state, metrics = self.step_fn(
                    self.state, self._next_batches(), rng
                )
                metric_rows = [metrics]
            else:
                if k_now != k:  # tail smaller than the compiled inner loop
                    tail_fn = jax.jit(
                        make_multi_step(self.config, self.models, k_now),
                        donate_argnums=0,
                    )
                else:
                    tail_fn = self.step_fn
                keys = jnp.stack(
                    [
                        jax.random.fold_in(self.loop_rng, step + i)
                        for i in range(k_now)
                    ]
                )
                batch_list = [self._next_batches() for _ in range(k_now)]
                stacked = Batches(
                    *(
                        jnp.stack([getattr(b, f) for b in batch_list])
                        for f in Batches._fields
                    )
                )
                self.state, metrics = tail_fn(self.state, stacked, keys)
                metric_rows = [
                    {name: value[i] for name, value in metrics.items()}
                    for i in range(k_now)
                ]
            for row in metric_rows:
                self.logger.append_metrics(row)
            if profile_step and step <= profile_step < step + k_now:
                jax.block_until_ready(metric_rows[-1]["total_gen_loss"])
                jax.profiler.stop_trace()
            step += k_now

            if step % log_interval == 0 or step == total:
                line = self.logger.print(step)
                if self.verbose:
                    rate = (step - self.start_step) / (time.perf_counter() - t0)
                    print(line + f" [{rate:.2f} it/s]")
                run_dir.mkdir(parents=True, exist_ok=True)
                with (run_dir / "log").open("a") as f:
                    f.write(line + "\n")

            if step % ckpt_interval == 0 or step == total:
                self.checkpoint(step - 1)
        return self.state

    def checkpoint(self, step: int) -> None:
        """Image grids + FID/KID validation + model checkpoint."""
        rng = jax.random.fold_in(self.base_rng, 7_000_000 + step)
        k_img, k_val = jax.random.split(rng)
        image_checkpoint(
            step,
            self.config,
            self.models,
            self.state,
            self.shoeprint_iter,
            self.shoemark_iter,
            k_img,
        )
        val_checkpoint(
            step,
            self.config,
            self.models,
            self.state,
            self.val_iter,
            k_val,
            real_images=self.shoemark_images,
        )
        save_checkpoint(self.ckpt_mgr, step + 1, self.state)


def train(config: Config, **kwargs) -> TrainState:
    """Convenience entry: build a Trainer and run to completion."""
    return Trainer(config, **kwargs).run()
