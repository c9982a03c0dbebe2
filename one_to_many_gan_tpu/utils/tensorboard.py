"""Optional TensorBoard metric sink (opt-in; VERDICT r3 #8).

The framework's canonical observability sinks are the reference-format
text ``log`` and the structured ``metrics.jsonl`` (one JSON object per
log interval / validation checkpoint — core/trainer.py, core/evaluation.py;
the reference has text logs only, src/core/evaluation.py:269-308). This
module adapts those to TensorBoard event files:

- ``TensorBoardWriter``: live writer the Trainer drives when
  ``tpu.tensorboard = true``;
- ``export_jsonl``: offline converter for an existing ``metrics.jsonl``
  (covers FID/KID validation records as well as training intervals), so
  completed or remote runs can be inspected without re-running.

Uses ``torch.utils.tensorboard`` (both torch and tensorboard are already
dependencies of this image; no new requirement). Import stays lazy: the
default path never touches it.
"""

from __future__ import annotations

import json
from pathlib import Path


def _scalars(record: dict) -> dict[str, float]:
    out = {}
    for k, v in record.items():
        if k == "step" or isinstance(v, bool) or not isinstance(v, (int, float)):
            continue
        out[k] = float(v)
    return out


# validation-checkpoint series (core/evaluation.py::val_checkpoint) get the
# val/ namespace so TensorBoard's standard train/val dashboard split works
_VAL_KEYS = frozenset({"fid", "kid"})


class TensorBoardWriter:
    """Thin scalar writer bound to one run's event directory."""

    def __init__(self, logdir: Path | str):
        from torch.utils.tensorboard import SummaryWriter

        self._writer = SummaryWriter(str(logdir))

    def write(self, step: int, scalars: dict) -> None:
        for k, v in _scalars({**scalars, "step": step}).items():
            prefix = "val" if k in _VAL_KEYS else "train"
            self._writer.add_scalar(f"{prefix}/{k}", v, step)
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()


def export_jsonl(jsonl_path: Path | str, logdir: Path | str) -> int:
    """Convert a run's ``metrics.jsonl`` into TensorBoard events.

    Every numeric field of every record becomes a scalar series keyed by
    field name (training intervals AND validation fid/kid records share
    the file). Returns the number of records exported.
    """
    jsonl_path = Path(jsonl_path)
    writer = TensorBoardWriter(logdir)
    n = 0
    try:
        for line in jsonl_path.read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            record = json.loads(line)
            writer.write(int(record.get("step", n)), record)
            n += 1
    finally:
        writer.close()
    return n


def main() -> None:  # pragma: no cover - thin CLI
    import argparse

    ap = argparse.ArgumentParser(description=export_jsonl.__doc__)
    ap.add_argument("jsonl", help="path to a run's metrics.jsonl")
    ap.add_argument("logdir", help="TensorBoard event directory to write")
    args = ap.parse_args()
    n = export_jsonl(args.jsonl, args.logdir)
    print(f"exported {n} records to {args.logdir}")


if __name__ == "__main__":
    main()
