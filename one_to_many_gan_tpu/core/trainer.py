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

import json
import signal
import time
from pathlib import Path
from typing import Any

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


class TrainingDiverged(RuntimeError):
    """A non-finite interval-mean metric was detected (tpu.halt_on_nonfinite).

    Raised at a log boundary BEFORE the same-step checkpoint, so the
    poisoned state is never persisted; under ``infinite_run.sh`` +
    ``tpu.resume`` the run restarts from the last good checkpoint.
    (Failure-detection subsystem — the reference trains silently through
    NaNs; SURVEY.md §5.)
    """


def _checkpoint_manager(config: Config):
    import orbax.checkpoint as ocp

    models_dir = (
        config["training"]["checkpoint_directory"]
        / config["training"]["training_run"]
        / "models"
    )
    models_dir.mkdir(parents=True, exist_ok=True)
    return ocp.CheckpointManager(
        models_dir.resolve(),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=config["tpu"]["keep_checkpoints"]
        ),
    )


def save_checkpoint(mgr, step: int, state: TrainState, *, wait: bool = True) -> None:
    """Orbax save. ``wait=False`` returns once device buffers are read to
    host; the disk commit proceeds asynchronously (overlapping the next
    K-step device program). Call ``mgr.wait_until_finished()`` before
    relying on the files."""
    import orbax.checkpoint as ocp

    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()


def restore_checkpoint(mgr, state: TrainState) -> tuple[TrainState, int]:
    """Restore the latest step if present; returns (state, start_step).

    The abstract tree carries each leaf's SHARDING, not just shape/dtype:
    the template ``state`` is already placed on the run's mesh (Trainer
    replicates before restoring), so Orbax restores every array directly
    onto its target devices. Without the shardings a single process
    silently round-trips through host memory and implicit resharding at
    the next jit call — and a MULTI-process restore cannot work at all
    (Orbax can't assemble a cross-host array without target shardings).
    Covered by tests/test_parallel.py (4x2-mesh save->restore->step
    equality) and tests/test_multihost.py (two-process resume).
    """
    import orbax.checkpoint as ocp

    latest = mgr.latest_step()
    if latest is None:
        return state, 0
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            jnp.shape(x), x.dtype, sharding=getattr(x, "sharding", None)
        ),
        state,
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
        # Persistent compilation cache: the fused step takes minutes to
        # compile on TPU; a restarted run (infinite_run.sh / tpu.resume)
        # must reuse the cached executable instead of recompiling.
        cache_dir = config["tpu"]["compilation_cache_dir"]
        if cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        self.models = Models(config)

        # Inner-loop length: scan K fused steps per jitted call, clamped so
        # the log/checkpoint cadences land on call boundaries.
        import math

        k_req = max(1, config["tpu"]["steps_per_call"])
        if config["tpu"]["split_phases"]:
            # Two separately-dispatched programs per step can't live inside
            # one scan; the split trades the K-step fusion for per-program
            # memory peaks (the 512² lever).
            k_req = 1
        k = math.gcd(
            math.gcd(k_req, config["evaluation"]["log_interval"]),
            config["evaluation"]["checkpoint_interval"],
        )
        if k != k_req:
            import warnings

            warnings.warn(
                f"tpu.steps_per_call={k_req} does not divide the log/"
                f"checkpoint intervals; clamped to {k}",
                stacklevel=2,
            )
        self.steps_per_call = k
        if config["tpu"]["ada_pallas"] and config["tpu"]["spatial_parallel"] > 1:
            # The Pallas warp kernel needs the full image rows on one
            # device; under H-sharding the XLA tent-contraction path (which
            # XLA partitions with collectives) is the correct one. Pure
            # data parallelism is fine: the kernel runs shard_map'd over
            # the batch axis (augment/pipeline.py warp_bilinear).
            import warnings

            warnings.warn(
                "tpu.ada_pallas disabled: incompatible with "
                "spatial_parallel > 1 (kernel needs unsharded image rows)",
                stacklevel=2,
            )
            config["tpu"]["ada_pallas"] = False

        # Mesh (single-device when the product is 1). Data parallelism is
        # clamped to the largest value dividing the batch size. Built
        # BEFORE the step program: the Pallas ADA warp needs the mesh at
        # trace time (shard_map over the data axis).
        dp = config["tpu"]["data_parallel"]
        sp = config["tpu"]["spatial_parallel"]
        n_dev = len(jax.devices())
        batch_size = config["training"]["batch_size"]
        if dp == -1:
            dp = n_dev // sp
        dp_req = dp
        while dp > 1 and batch_size % dp != 0:
            dp -= 1
        if dp != dp_req:
            import warnings

            warnings.warn(
                f"tpu.data_parallel={dp_req} does not divide batch_size="
                f"{batch_size}; clamped to {dp}",
                stacklevel=2,
            )
        self.mesh = make_mesh(dp, sp) if dp * sp > 1 else None

        # One jitted program per group length K, cached — the tail group of
        # a run whose total isn't a K-multiple must not trigger a fresh
        # multi-minute compile every restart (and never twice per process).
        self._step_fns: dict[int, Any] = {}
        self.step_fn = self._get_step_fn(k)

        seed = config["training"]["random_seed"]
        self.base_rng = jax.random.key(seed)
        init_rng, self.loop_rng = jax.random.split(self.base_rng)
        self.state = init_train_state(config, self.models, init_rng)
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

        def train_iter(images, offset, *, as_float=False):
            # Training batches stay uint8 across the transfer; the jitted
            # step normalizes on device (_jit_step).
            return BatchIterator(
                images,
                batch,
                shuffle=True,
                flip_prob=0.5,
                seed=seed + offset,
                host_id=host_id,
                host_count=host_count,
                native=native,
                as_float=as_float,
            )

        # Independent streams for the D and G sub-steps (the reference pulls
        # 2 batches per domain per iteration from one cycled loader).
        self.shoeprint_iter = train_iter(shoeprint_images, 1)
        self.shoemark_iter = train_iter(shoemark_images, 2)
        # Dedicated streams for the checkpoint image grids so the training
        # iterators are owned exclusively by the batch producer (prefetch
        # thread) — the reference reuses its train loader for grids, which
        # would race here.
        self.grid_print_iter = train_iter(shoeprint_images, 3, as_float=True)
        self.grid_mark_iter = train_iter(shoemark_images, 4, as_float=True)
        # flip_prob matches the reference protocol: ShoeDataset.__getitem__
        # applies RandomHorizontalFlip(p=0.5) in ALL modes, including the
        # validation loader feeding FID/KID generation.
        self.val_iter = BatchIterator(
            shoeprint_images,
            config["evaluation"]["inference_batch_size"],
            shuffle=False,
            flip_prob=0.5,
            seed=seed,
            host_id=host_id,
            host_count=host_count,
        )

        self.logger = Logger(config["training"]["training_steps"])
        self._reals_cache: dict = {}  # FID real-side features, per extractor
        self._tb = None  # lazy TensorBoard writer (tpu.tensorboard)
        self.ckpt_mgr = _checkpoint_manager(config)
        if config["tpu"]["resume"]:
            self.state, self.start_step = restore_checkpoint(self.ckpt_mgr, self.state)
            if self.verbose and self.start_step:
                print(f"Resumed from checkpoint at step {self.start_step}")
            if self.start_step:
                # Fast-forward the training data streams to the resume
                # point: each trained step consumed 2 batches per domain
                # (one D draw + one G draw, _next_batches_np), so the
                # resumed run continues the exact per-host stream an
                # uninterrupted run would have fed to step start_step+1.
                # Eval-side streams (grids, FID) are not fast-forwarded:
                # they never enter the gradient path. Cost: RNG draws +
                # index arithmetic only (no image gathers) — O(ms) even
                # at 150k steps.
                self.shoeprint_iter.skip(2 * self.start_step)
                self.shoemark_iter.skip(2 * self.start_step)
        else:
            self.start_step = 0

    # ------------------------------------------------------------ loop

    def _get_step_fn(self, k: int):
        """The jitted K-step program, cached per K (tail groups reuse it)."""
        if k not in self._step_fns:
            if self.verbose and self._step_fns:
                print(f"building step program for group length {k}")
            self._step_fns[k] = self._jit_step(k)
        return self._step_fns[k]

    def _jit_step(self, k: int):
        """Jit the K-step program behind a fused uint8 -> [-1,1] cast.

        Training batches cross host->device as uint8 (4x fewer bytes than
        float32 — significant through a tunnel / over DCN); the
        normalization (data/pipeline.py normalize_u8) fuses into the
        batches' first use inside the same XLA program.
        """
        def normalize(batches_u8: Batches) -> Batches:
            return Batches(
                *(x.astype(jnp.float32) / 127.5 - 1.0 for x in batches_u8)
            )

        if self.config["tpu"]["split_phases"]:
            from one_to_many_gan_tpu.core.train_step import make_phase_fns

            d_phase, g_phase = make_phase_fns(
                self.config, self.models, self.mesh
            )
            d_jit = jax.jit(
                lambda s, b, r: d_phase(s, normalize(b), r), donate_argnums=0
            )
            g_jit = jax.jit(
                lambda s, b, r, p: g_phase(s, normalize(b), r, p),
                donate_argnums=0,
            )

            def split_stepper(state, batches_u8: Batches, rng):
                state, d_metrics = d_jit(state, batches_u8, rng)
                # p_used stays on device (the probability entering the step)
                state, g_metrics = g_jit(
                    state, batches_u8, rng, d_metrics["ada_p"]
                )
                return state, {**d_metrics, **g_metrics}

            return split_stepper

        inner = (
            make_multi_step(self.config, self.models, k, self.mesh)
            if k > 1
            else make_train_step(self.config, self.models, self.mesh)
        )

        def stepper(state, batches_u8: Batches, rng):
            return inner(state, normalize(batches_u8), rng)

        return jax.jit(stepper, donate_argnums=0)

    def _next_batches_np(self) -> Batches:
        return Batches(
            d_shoeprints=next(self.shoeprint_iter),
            d_shoemarks=next(self.shoemark_iter),
            g_shoeprints=next(self.shoeprint_iter),
            g_shoemarks=next(self.shoemark_iter),
        )

    def _put(self, x):
        if self.mesh is not None:
            return shard_batch(self.mesh, x)
        return jax.device_put(x)

    def _make_group(self, k_now: int) -> Batches:
        """Assemble + transfer the batches for one jitted call (k_now fused
        steps): [B,...] when k_now == 1, stacked [K,B,...] otherwise."""
        if k_now == 1:
            return Batches(*(self._put(x) for x in self._next_batches_np()))
        group = [self._next_batches_np() for _ in range(k_now)]
        return Batches(
            *(
                self._put(np.stack([getattr(b, f) for b in group]))
                for f in Batches._fields
            )
        )

    @staticmethod
    def _schedule(start: int, total: int, k: int) -> list[int]:
        out = []
        step = start
        while step < total:
            out.append(min(k, total - step))
            step += out[-1]
        return out

    def run(self, max_steps: int | None = None) -> TrainState:
        config = self.config
        final = config["training"]["training_steps"]
        total = final
        if max_steps is not None:
            total = min(total, self.start_step + max_steps)
        ckpt_interval = config["evaluation"]["checkpoint_interval"]

        k = self.steps_per_call
        schedule = self._schedule(self.start_step, total, k)

        # Host prefetch: a producer thread assembles and device_puts the
        # next groups while the device executes the current program.
        depth = config["tpu"]["prefetch"]
        if depth > 0 and schedule:
            import queue
            import threading

            q: queue.Queue = queue.Queue(maxsize=depth)

            def produce():
                try:
                    for k_now in schedule:
                        q.put(self._make_group(k_now))
                except Exception as exc:  # surface in the consumer
                    q.put(exc)

            producer = threading.Thread(target=produce, daemon=True)
            producer.start()

            def get_group(_k_now: int) -> Batches:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                return item
        else:
            get_group = self._make_group

        # Preemption safety: TPU pods get SIGTERM'd (maintenance, spot
        # reclaim). Stop at the next step-group boundary and persist a
        # model-only checkpoint so the restart loses no work — the
        # reference's restart loop loses everything since the last
        # 5k-step checkpoint.
        self._preempted = False

        def _on_term(signum, frame):  # noqa: ARG001
            self._preempted = True
            if self.verbose:
                print(
                    "SIGTERM: checkpointing and exiting at the next step boundary"
                )

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # not the main thread: no handler, no preemption stop
            prev_handler = None

        step = self.start_step
        try:
            step = self._run_loop(schedule, step, get_group, total)
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
        if step < final and step % ckpt_interval != 0 and step > self.start_step:
            # A max_steps-bounded pause or a SIGTERM preemption that stops
            # off-cadence: save a model-only checkpoint (no FID/grids) so a
            # later resume does not silently replay the steps since the
            # last interval.
            save_checkpoint(self.ckpt_mgr, step, self.state, wait=False)
        self.ckpt_mgr.wait_until_finished()  # flush async saves
        if self._tb is not None:
            self._tb.close()
            self._tb = None
        return self.state

    def _run_loop(self, schedule, step, get_group, total) -> int:
        """Execute the scheduled step groups; returns the step reached."""
        config = self.config
        final = config["training"]["training_steps"]
        log_interval = config["evaluation"]["log_interval"]
        ckpt_interval = config["evaluation"]["checkpoint_interval"]
        profile_step = config["tpu"]["profile_step"]
        run_dir = (
            config["training"]["checkpoint_directory"]
            / config["training"]["training_run"]
        )
        t0 = time.perf_counter()
        for k_now in schedule:
            if profile_step and step <= profile_step < step + k_now:
                jax.profiler.start_trace(str(run_dir / "trace"))
            batches = get_group(k_now)
            if k_now == 1:
                fn = self._get_step_fn(1)
                rng = jax.random.fold_in(self.loop_rng, step)
                self.state, metrics = fn(self.state, batches, rng)
            else:
                fn = self._get_step_fn(k_now)
                keys = jnp.stack(
                    [
                        jax.random.fold_in(self.loop_rng, step + i)
                        for i in range(k_now)
                    ]
                )
                self.state, metrics = fn(self.state, batches, keys)
            # Scalar [] (k=1) or stacked [K] metrics append as-is; the
            # Logger flattens at print time with one device_get.
            self.logger.append_metrics(metrics)
            if profile_step and step <= profile_step < step + k_now:
                jax.block_until_ready(metrics["total_gen_loss"])
                jax.profiler.stop_trace()
            step += k_now

            if step % log_interval == 0 or step == total:
                line, means = self.logger.summary(step)
                if self.verbose:
                    rate = (step - self.start_step) / (time.perf_counter() - t0)
                    print(line + f" [{rate:.2f} it/s]")
                run_dir.mkdir(parents=True, exist_ok=True)
                with (run_dir / "log").open("a") as f:
                    f.write(line + "\n")
                # Structured sink alongside the reference-format text log:
                # one JSON object per interval (machine-readable
                # observability; trivially adaptable to TensorBoard/W&B).
                with (run_dir / "metrics.jsonl").open("a") as f:
                    f.write(json.dumps({"step": step, **means}) + "\n")
                if config["tpu"]["tensorboard"]:
                    if self._tb is None:
                        from one_to_many_gan_tpu.utils.tensorboard import (
                            TensorBoardWriter,
                        )

                        self._tb = TensorBoardWriter(run_dir / "tensorboard")
                    self._tb.write(step, means)
                if config["tpu"]["halt_on_nonfinite"] and not all(
                    np.isfinite(v) for v in means.values()
                ):
                    bad = [k for k, v in means.items() if not np.isfinite(v)]
                    msg = (
                        f"non-finite metrics {bad} in the interval ending at "
                        f"step {step}; halting BEFORE checkpointing the "
                        "poisoned state — resume restarts from the latest "
                        "persisted checkpoint (tpu.halt_on_nonfinite)"
                    )
                    raise TrainingDiverged(msg)

            # Full checkpoint on the cadence, plus once at the TRUE end of
            # training (a max_steps-bounded pause is not an end).
            if step % ckpt_interval == 0 or step == final:
                self.checkpoint(step - 1)
            if self._preempted:
                break
        return step

    def checkpoint(self, step: int) -> None:
        """Image grids + FID/KID validation + model checkpoint."""
        rng = jax.random.fold_in(self.base_rng, 7_000_000 + step)
        k_img, k_val = jax.random.split(rng)
        image_checkpoint(
            step,
            self.config,
            self.models,
            self.state,
            self.grid_print_iter,
            self.grid_mark_iter,
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
            reals_cache=self._reals_cache,
        )
        # Async: device buffers are read here; the disk commit overlaps the
        # next K-step device program (run() flushes at the end).
        save_checkpoint(self.ckpt_mgr, step + 1, self.state, wait=False)


def train(config: Config, **kwargs) -> TrainState:
    """Convenience entry: build a Trainer and run to completion."""
    return Trainer(config, **kwargs).run()
