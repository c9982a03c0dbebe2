"""InceptionV3 pool3 feature extractor (for clean-fid-comparable FID).

clean-fid's FID uses the classic TF-Slim InceptionV3 pool3 features.
This environment has no network egress and ships no pretrained weights,
so the extractor activates only when weights are provided out-of-band:

- set ``OTM_INCEPTION_WEIGHTS`` to a ``.npz`` of parameters matching the
  torchvision ``inception_v3`` state-dict naming, or
- drop the standard torchvision checkpoint into ``~/.cache/torch/hub/checkpoints``
  with torch available to read it.

When absent, metrics/fid.py falls back to a deterministic random-conv
extractor (relative tracking only; documented there). The full JAX
InceptionV3 forward lives in metrics/inception_jax.py (numerically
validated against a torch oracle in tests/test_metrics.py); provided
weights run on-TPU end to end.
"""

from __future__ import annotations

import os
from pathlib import Path


def _find_weights() -> Path | None:
    env = os.environ.get("OTM_INCEPTION_WEIGHTS")
    if env and Path(env).exists():
        return Path(env)
    cache = Path.home() / ".cache/torch/hub/checkpoints"
    if cache.exists():
        for pattern in ("inception*", "pt_inception*"):
            hits = sorted(cache.glob(pattern))
            if hits:
                return hits[0]
    return None


def try_load_inception():
    """Return a FeatureFn if InceptionV3 weights are available, else None.

    Runs the on-TPU JAX InceptionV3 (metrics/inception_jax.py) with
    torchvision-format weights (.npz or torch checkpoint)."""
    weights = _find_weights()
    if weights is None:
        return None
    try:
        from one_to_many_gan_tpu.metrics.inception_jax import (
            load_params,
            make_extractor,
        )

        return make_extractor(load_params(weights))
    except Exception as exc:  # malformed/incompatible weights: fall back
        print(f"inception weights at {weights} unusable ({exc}); falling back")
        return None
