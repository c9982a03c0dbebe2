"""one_to_many_gan_tpu: a TPU-native JAX framework for one-to-many image translation.

A ground-up rebuild of the capabilities of ``struan-robertson/one-to-many-gan``
(a PyTorch single-GPU research codebase) as an idiomatic TPU framework:

- NHWC tensors, bf16-capable conv stacks that map onto the MXU
- StyleGAN2 weight modulation reformulated as activation scaling +
  batched convolution + output demodulation (no per-sample weight
  materialization, no grouped conv)
- one fused, jitted train step (D update, G update, ADA controller,
  image replay buffer) per loop iteration
- ``jax.sharding`` data/spatial parallelism over a device Mesh
- Orbax checkpointing with real resume
"""

__version__ = "0.1.0"

from one_to_many_gan_tpu.config import Config, load_config

__all__ = ["Config", "load_config", "__version__"]
