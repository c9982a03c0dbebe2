"""Config system: TOML -> nested typed dict.

Public-API compatible with the reference's config schema
(reference: src/data/config.py:8-85, config.toml:1-48): the same six
sections with the same key names load unchanged. A seventh, optional
``[tpu]`` section adds TPU-native knobs (precision policy, mesh shape,
EMA / R1 options) with defaults chosen so that omitting the section
reproduces reference behavior.
"""

from __future__ import annotations

import tomllib
from pathlib import Path
from typing import Any, TypedDict


class TrainingConfig(TypedDict):
    batch_size: int
    random_seed: int
    training_steps: int
    image_buffer_size: int
    style_mixing_prob: float
    deterministic_cuda_kernels: bool  # accepted for compat; JAX is deterministic
    gpu_number: int  # accepted for compat; device selection is via mesh on TPU
    checkpoint_directory: Path
    training_run: str


class OptimisationConfig(TypedDict):
    style_cycle_loss_lambda: float
    identity_loss_lambda: float
    reconstruction_loss_lambda: float
    kl_loss_lambda: float
    path_loss_lambda: float
    path_loss_jacobian_granularity: tuple[float, float]
    learning_rate: float
    mapping_network_learning_rate: float
    adam_betas: tuple[float, float]


class AdaConfig(TypedDict):
    discriminator_real_acc_target: float
    ada_overfitting_measurement_n_images: int
    ada_adjustment_size: float


class EvaluationConfig(TypedDict):
    log_interval: int
    checkpoint_interval: int
    n_evaluation_images: int
    inference_batch_size: int


class ArchitectureConfig(TypedDict):
    w_dim: int
    add_latent_noise: bool
    min_latent_resolution: int
    n_resnet_blocks: int
    mapping_network_layers: int


class DataConfig(TypedDict):
    image_size: tuple[int, int]  # (height, width)
    image_channels: int
    shoeprint_data_dir: Path
    shoemark_data_dir: Path


class TpuConfig(TypedDict):
    """TPU-native extension section (new capability, not in the reference)."""

    # Compute dtype for conv/matmul activations: "float32" or "bfloat16".
    precision: str
    # Device mesh: number of data-parallel and spatial-parallel shards.
    # data_parallel = -1 means "all available devices".
    data_parallel: int
    spatial_parallel: int
    # Exponential moving average of generator weights (0 disables).
    ema_decay: float
    # R1 gradient penalty weight on the discriminator (0 disables) and its
    # lazy-regularization interval in steps.
    r1_gamma: float
    r1_interval: int
    # Activation rematerialization in the loss backwards. Modes:
    #   "none" — store every activation (fastest per step, most HBM);
    #   "conv" — save ONLY conv outputs (checkpoint_name-tagged); the cheap
    #            elementwise chains between convs (instance norm, ReLU, pad,
    #            FIR resamples) are recomputed in the backward. Cuts the
    #            activation footprint severalfold for a few % recompute —
    #            the knob that unlocks larger (faster, see BASELINE.md)
    #            batches on a 16GB chip;
    #   "full" — jax.checkpoint every model pass (max memory saving,
    #            ~full forward recompute).
    # Booleans are accepted for back-compat: False -> "none", True -> "full".
    remat: str
    # Remat override for the DISCRIMINATOR phase ("same" follows `remat`).
    # The D phase's live activations are a fraction of the G phase's (one
    # backward pass vs ~11), so under split_phases the D phase usually
    # runs remat-free while the G phase keeps "conv".
    remat_d: str
    # Run the D update and G update as TWO separately jitted programs
    # instead of one fused step. Costs one extra dispatch per step
    # (~30 ms through a tunnel/DCN host) but halves each program's peak
    # live-activation memory — the 512² lever (BASELINE.md). Bit-identical
    # math (both programs derive the same per-step RNG split). Forces
    # steps_per_call = 1.
    split_phases: bool
    # Split the G phase's six-term backward into TWO accumulated
    # sub-backwards — {kl,rec,idt,gan,style} and {path} — exact math
    # (grads of a sum = sum of grads, up to float reassociation) at the
    # price of one extra encoder forward. Each sub-program's live
    # activation peak is a fraction of the joint 11-pass backward's: the
    # memory lever that unlocks batch >4 at 512² on a 16GB chip, on top
    # of split_phases.
    g_loss_split: bool
    # Lazy path-length regularization: run the θ-path term (the 2B decoder
    # extract, reference src/core/training.py:212-234 — the single most
    # expensive G loss leg, ~16% of the step at 256²) only every
    # path_interval steps, with its weight scaled by the interval so the
    # time-averaged regularization pressure is unchanged — StyleGAN2's own
    # lazy-regularization trick, the exact pattern this step already uses
    # for R1 (r1_interval). 1 = every step (reference-exact). Off-interval
    # steps genuinely skip the extract program (lax.cond) and report
    # path_loss = 0.
    path_interval: int
    # Fused steps executed per jitted call (lax.scan inner loop). Amortizes
    # host dispatch overhead; clamped to divide the log/checkpoint
    # intervals so cadences are preserved.
    steps_per_call: int
    # Auto-resume from the latest Orbax checkpoint if present.
    resume: bool
    # Use the C++ native data loader when available.
    native_loader: bool
    # Emit jax.profiler traces to <checkpoint_dir>/<run>/trace at this step
    # (0 disables).
    profile_step: int
    # Anti-aliased ADA warp (the published pipeline's supersampled-warp
    # behavior; see augment/pipeline.py). Disable to use plain bilinear.
    ada_antialias: bool
    # TRUE 2x supersampled sym6-filtered ADA warp (the published pipeline
    # verbatim) instead of the zero-cost adaptive-tent approximation:
    # ~16x the warp FLOPs — the quality opt-in for runs where D's mid-p
    # training signal must match the published filter family exactly.
    # Overrides ada_antialias/ada_pallas for the geometric warp.
    ada_supersample: bool
    # Route the ADA geometric warp through the fused Pallas VMEM kernel
    # (ops/pallas/warp.py; single-channel images). Same math as the XLA
    # path without its HBM tent intermediate.
    ada_pallas: bool
    # Host-side batch prefetch depth: a producer thread assembles and
    # device_puts the next groups of batches while the device runs the
    # current K-step program (0 disables).
    prefetch: int
    # Space-to-depth-pack the low-channel large-spatial 3x3 convs
    # (encoder first level / decoder last level): 2x2@4C conv at half
    # resolution, 16/9 the FLOPs at a much higher MXU rate
    # (ops/equalized.py conv3x3_s2d_packed). Disabled automatically under
    # spatial sharding.
    s2d_pack: bool
    # Persistent XLA compilation cache directory ("" disables). Set by the
    # Trainer so crash-restarted runs (infinite_run.sh + tpu.resume) reuse
    # compiled executables instead of paying the multi-minute recompile.
    compilation_cache_dir: str
    # Orbax checkpoint retention: how many of the newest model
    # checkpoints to keep on disk (older ones are garbage-collected).
    # A 150k-step run at the reference's 5k-step cadence would otherwise
    # accumulate 30 full model+optimizer snapshots.
    keep_checkpoints: int
    # Failure detection: raise TrainingDiverged when any interval-mean
    # metric is non-finite at a log boundary, BEFORE the poisoned state
    # can be checkpointed. Under infinite_run.sh + tpu.resume the process
    # then restarts from the last good checkpoint (the replay is
    # deterministic — useful for reproducing the divergence). The
    # reference trains silently through NaNs.
    halt_on_nonfinite: bool
    # Opt-in TensorBoard event files alongside the text log and
    # metrics.jsonl (utils/tensorboard.py; offline export also available
    # via `python -m one_to_many_gan_tpu.utils.tensorboard`).
    tensorboard: bool
    # Hard-fail FID comparability guard: when true, validation raises
    # instead of silently logging a random-projection (relative-only) FID
    # if InceptionV3 weights are unavailable. A production run whose FID
    # must be comparable to the reference protocol (clean-fid InceptionV3,
    # reference src/core/evaluation.py:64-69) should set this; the default
    # keeps smoke/dev runs working in weight-less environments.
    require_inception_fid: bool


class Config(TypedDict):
    """Full training/running configuration."""

    training: TrainingConfig
    optimisation: OptimisationConfig
    ada: AdaConfig
    evaluation: EvaluationConfig
    architecture: ArchitectureConfig
    data: DataConfig
    tpu: TpuConfig


_TPU_DEFAULTS: TpuConfig = {
    "precision": "float32",
    "data_parallel": -1,
    "spatial_parallel": 1,
    "ema_decay": 0.0,
    "r1_gamma": 0.0,
    "r1_interval": 16,
    "remat": "none",
    "remat_d": "same",
    "split_phases": False,
    "g_loss_split": False,
    "path_interval": 1,
    "steps_per_call": 1,
    "resume": True,
    "native_loader": False,
    "profile_step": 0,
    "ada_antialias": True,
    "ada_supersample": False,
    "ada_pallas": False,
    "prefetch": 2,
    "s2d_pack": False,
    "compilation_cache_dir": "/tmp/jax_cache",
    "keep_checkpoints": 3,
    "halt_on_nonfinite": True,
    "require_inception_fid": False,
    "tensorboard": False,
}

_REQUIRED_SECTIONS = (
    "training",
    "optimisation",
    "ada",
    "evaluation",
    "architecture",
    "data",
)


def _validate(config: dict[str, Any]) -> None:
    for section in _REQUIRED_SECTIONS:
        if section not in config:
            msg = f"config missing required section [{section}]"
            raise KeyError(msg)
    gran = config["optimisation"]["path_loss_jacobian_granularity"]
    if len(gran) != 2 or gran[0] > gran[1]:
        msg = f"path_loss_jacobian_granularity must be [min, max], got {gran}"
        raise ValueError(msg)
    if len(config["data"]["image_size"]) != 2:
        msg = "data.image_size must be [height, width]"
        raise ValueError(msg)
    if config["tpu"]["precision"] not in ("float32", "bfloat16"):
        msg = f"tpu.precision must be float32|bfloat16, got {config['tpu']['precision']}"
        raise ValueError(msg)
    remat = config["tpu"]["remat"]
    if isinstance(remat, bool):  # back-compat with the round-1 boolean knob
        remat = "full" if remat else "none"
        config["tpu"]["remat"] = remat
    if remat not in ("none", "conv", "full"):
        msg = f"tpu.remat must be none|conv|full (or bool), got {remat!r}"
        raise ValueError(msg)
    remat_d = config["tpu"]["remat_d"]
    if remat_d not in ("same", "none", "conv", "full"):
        msg = f"tpu.remat_d must be same|none|conv|full, got {remat_d!r}"
        raise ValueError(msg)
    path_interval = config["tpu"]["path_interval"]
    if not isinstance(path_interval, int) or path_interval < 1:
        msg = f"tpu.path_interval must be an int >= 1, got {path_interval!r}"
        raise ValueError(msg)


def load_config(path: Path | str) -> Config:
    """Load a TOML file of hyperparameters into a nested dict.

    Mirrors the reference loader contract (src/data/config.py:71-85):
    the three directory entries are converted to ``Path``.
    """
    path = Path(path)
    with path.open("rb") as f:
        config: dict[str, Any] = tomllib.load(f)

    config["training"]["checkpoint_directory"] = Path(
        config["training"]["checkpoint_directory"]
    )
    config["data"]["shoeprint_data_dir"] = Path(config["data"]["shoeprint_data_dir"])
    config["data"]["shoemark_data_dir"] = Path(config["data"]["shoemark_data_dir"])

    tpu = dict(_TPU_DEFAULTS)
    tpu.update(config.get("tpu", {}))
    config["tpu"] = tpu

    _validate(config)
    return config  # type: ignore[return-value]


def n_downsamples(config: Config) -> int:
    """Encoder/decoder resampling depth.

    ceil(log2(min(image_size) / min_latent_resolution)) — the same
    constructive rule as the reference generator (src/model/builder.py:153-158).
    """
    import math

    min_res = min(config["data"]["image_size"])
    return math.ceil(math.log2(min_res / config["architecture"]["min_latent_resolution"]))
