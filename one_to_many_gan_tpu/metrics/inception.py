"""InceptionV3 pool3 feature extractor (for clean-fid-comparable FID).

clean-fid's FID uses the classic TF-Slim InceptionV3 pool3 features.
This environment has no network egress and ships no pretrained weights,
so the extractor activates only when weights are provided out-of-band:

- set ``OTM_INCEPTION_WEIGHTS`` to a ``.npz`` of parameters matching the
  torchvision ``inception_v3`` state-dict naming, or
- drop the standard torchvision checkpoint into ``~/.cache/torch/hub/checkpoints``
  with torch available to read it.

When absent, metrics/fid.py falls back to a deterministic random-conv
extractor (relative tracking only; documented there).

TODO(follow-up round): full JAX InceptionV3 forward so provided weights
run on-TPU end to end.
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
    """Return a FeatureFn if InceptionV3 weights are available, else None."""
    weights = _find_weights()
    if weights is None:
        return None
    try:  # torch runs the canonical graph on CPU; fine for offline eval
        import numpy as np
        import torch
        from torchvision.models import inception_v3
    except ImportError:
        return None

    model = inception_v3(weights=None, aux_logits=True, init_weights=False)
    state = torch.load(weights, map_location="cpu", weights_only=True)
    model.load_state_dict(state, strict=False)
    model.fc = torch.nn.Identity()
    model.eval()

    def extract(images_u8):
        import torch.nn.functional as F

        x = torch.from_numpy(images_u8).permute(0, 3, 1, 2).float() / 255.0
        if x.shape[1] == 1:
            x = x.repeat(1, 3, 1, 1)
        x = F.interpolate(x, (299, 299), mode="bilinear", align_corners=False)
        x = (x - 0.5) / 0.5
        feats = []
        with torch.no_grad():
            for i in range(0, x.shape[0], 32):
                feats.append(model(x[i : i + 32]).numpy())
        return np.concatenate(feats)

    return extract
