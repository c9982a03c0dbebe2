"""256² round-4 sweep: does g_loss_split admit batch >16 remat-free?

The 256² operating point is b16 remat=none (~50 img/s/chip, BASELINE.md);
b32 OOM'd in every round-2 formulation (remat=conv saved-activation set
alone exceeds HBM, remat=full erases the batch gain). ``tpu.g_loss_split``
(VERDICT r3 #4) halves the G backward's live-activation peak by splitting
the six-term loss into two accumulated sub-backwards — exactly the lever
that made 512² b5-b8 candidates plausible. This sweep measures whether it
unlocks a remat-free 256² point above b16, and what g_split costs at b16.

Batch sizes stay multiples of 8 where possible (sublane alignment); b24
probes the midpoint if b32 OOMs. Usage: run on TPU in a background shell
after the round-4 capture queue (never concurrently — CLAUDE.md).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

CONFIGS = [
    # (label, BATCH, REMAT(G), REMAT_D, SPLIT, G_SPLIT)
    ("split b16 g=none gsplit", 16, "none", "none", "1", "1"),
    ("split b32 g=none gsplit", 32, "none", "none", "1", "1"),
    ("split b24 g=none gsplit", 24, "none", "none", "1", "1"),
    ("split b32 g=conv gsplit", 32, "conv", "none", "1", "1"),
]


def main() -> None:
    results = []
    for label, batch, remat, remat_d, split, g_split in CONFIGS:
        env = dict(
            os.environ,
            OTM_BENCH_SIZE="256",
            OTM_BENCH_BATCH=str(batch),
            OTM_BENCH_REMAT=remat,
            OTM_BENCH_REMAT_D=remat_d,
            OTM_BENCH_SPLIT=split,
            OTM_BENCH_G_SPLIT=g_split,
            OTM_BENCH_STEPS="16",
            OTM_BENCH_STEPS_PER_CALL="4",
        )
        print(f"=== {label}", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, str(ROOT / "bench.py")],
                env=env,
                capture_output=True,
                text=True,
                timeout=2400,
            )
            line = [
                ln for ln in out.stdout.splitlines() if ln.startswith("{")
            ]
            if line:
                val = json.loads(line[-1])["value"]
                results.append((label, val))
                print(f"    -> {val} img/s/chip", flush=True)
            else:
                tail = (out.stderr or out.stdout).strip().splitlines()[-4:]
                results.append((label, f"FAILED: {' | '.join(tail)[-200:]}"))
                print(f"    -> FAILED rc={out.returncode}", flush=True)
        except subprocess.TimeoutExpired:
            results.append((label, "TIMEOUT"))
            print("    -> TIMEOUT", flush=True)

    print("\n=== sweep results")
    for label, val in results:
        print(f"{label:36s} {val}")


if __name__ == "__main__":
    main()
