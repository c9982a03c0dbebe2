"""FID-weights unblock probe (VERDICT r4 #7): asset -> evidence, hands-free.

The FID comparability gap (reference contract:
/root/reference/src/core/evaluation.py:64-69 via clean-fid InceptionV3) is
asset-blocked: this environment ships no Inception weights and has no
egress. This stage runs in every round capture so the MOMENT weights
appear (OTM_INCEPTION_WEIGHTS or ~/.cache/torch/hub/checkpoints), the
comparability evidence is produced with zero builder intervention:

1. load the weights through the production path (metrics/inception.py);
2. self-checks on the JAX InceptionV3 forward: pool3 shape (N, 2048),
   finiteness, FID(a, a) == 0, FID(a, b) > 0 on synthetic dirs;
3. one REAL Inception-FID number over synthetic image dirs through the
   full compute_fid path (require_inception=True), i.e. exactly what a
   val_checkpoint runs — ready to paste as the BASELINE.md row.

Always prints ONE JSON line; exit 0 with status "absent" when there is
nothing to do (the capture queue treats that as success).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _configure_jax() -> None:
    import jax

    # OTM_FID_PROBE_CPU=1 forces the CPU backend (tests; also useful when
    # the tunnel is down). The env var JAX_PLATFORMS does not work in this
    # image (the axon plugin force-sets it), so use jax.config before any
    # backend init.
    if os.environ.get("OTM_FID_PROBE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main() -> None:
    _configure_jax()
    from one_to_many_gan_tpu.metrics.inception import _find_weights

    weights = _find_weights()
    if weights is None:
        print(json.dumps({
            "stage": "fid_weights_probe",
            "status": "absent",
            "detail": "no InceptionV3 weights (OTM_INCEPTION_WEIGHTS unset, "
                      "no ~/.cache/torch/hub/checkpoints hit); FID stays "
                      "random-projection (relative-only)",
        }))
        return

    import numpy as np

    from one_to_many_gan_tpu.data import write_synthetic_dataset_dirs
    from one_to_many_gan_tpu.metrics.fid import compute_fid, default_extractor

    record: dict = {"stage": "fid_weights_probe", "weights": str(weights)}
    try:
        extractor, tag = default_extractor(require_inception=True)
        record["extractor"] = tag

        # self-checks on the forward
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (4, 64, 64, 1), dtype=np.uint8)
        feats = np.asarray(extractor(imgs))
        assert feats.shape == (4, 2048), feats.shape
        assert np.isfinite(feats).all()
        record["pool3_shape_ok"] = True

        with tempfile.TemporaryDirectory() as td:
            a = Path(td) / "a"
            b = Path(td) / "b"
            write_synthetic_dataset_dirs(a, n_train=24, n_test=0,
                                         image_size=(64, 64), seed=0)
            write_synthetic_dataset_dirs(b, n_train=24, n_test=0,
                                         image_size=(64, 64), seed=9)
            fid_aa = compute_fid(a / "train", a / "train", extractor=extractor)
            fid_ab = compute_fid(a / "train", b / "train", extractor=extractor)
        assert abs(fid_aa) < 1e-3, fid_aa
        assert fid_ab >= fid_aa
        record.update({
            "status": "ok",
            "fid_self": round(float(fid_aa), 6),
            "fid_cross_synthetic": round(float(fid_ab), 4),
            "next": "run a val_checkpoint on a trained run for the "
                    "reference-comparable number (tpu.require_inception_fid)",
        })
    except Exception as exc:  # noqa: BLE001 — record, don't crash the queue
        record.update({"status": "error",
                       "detail": f"{type(exc).__name__}: {exc}"[:400]})
    print(json.dumps(record))


if __name__ == "__main__":
    main()
