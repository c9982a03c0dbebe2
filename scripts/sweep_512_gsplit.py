"""512² round-4 sweep: the g_loss_split lever on top of split phases.

VERDICT r3 #4: the G phase's six-term backward is one monolithic 11-pass
program; ``tpu.g_loss_split`` splits it into two accumulated sub-backwards
(grads of a sum = sum of grads — exact up to reassociation), cutting the
live-activation peak. The round-3 512² operating point is split-phase
b4 remat=none at 8.07 img/s/chip (BASELINE.md); the b5/b6 points OOM'd by
1-2 GB. This sweep measures whether g_split admits b5/b6 remat-free, and
what g_split costs at the known-good b4 point.

Usage: python scripts/sweep_512_gsplit.py   (TPU; run in a background
shell — first-compile points take 5-15 min each through the tunnel).
Prints one result table; paste the rows into BASELINE.md.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

CONFIGS = [
    # (label, BATCH, REMAT(G), REMAT_D, SPLIT, G_SPLIT)
    ("split b4 g=none d=none (r3 point)", 4, "none", "none", "1", "0"),
    ("split b4 g=none gsplit", 4, "none", "none", "1", "1"),
    ("split b5 g=none gsplit", 5, "none", "none", "1", "1"),
    ("split b6 g=none gsplit", 6, "none", "none", "1", "1"),
    ("split b8 g=none gsplit", 8, "none", "none", "1", "1"),
]


def main() -> None:
    results = []
    for label, batch, remat, remat_d, split, g_split in CONFIGS:
        env = dict(
            os.environ,
            OTM_BENCH_SIZE="512",
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
