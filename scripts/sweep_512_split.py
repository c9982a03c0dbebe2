"""512² operating-point sweep: fused vs split-phase programs (VERDICT r2 #2).

Runs bench.py configurations sequentially on the one real chip and
prints a result table. The round-2 point was 6.80 img/s/chip at
b4/remat="conv" fused; the hypothesis is that splitting D/G into two
jitted programs (tpu.split_phases) halves per-program peak activations,
admitting batch 8 with remat only on the G phase.

Usage: python scripts/sweep_512_split.py  (TPU; ~1h first run, cached after)
"""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

CONFIGS = [
    # (label, BATCH, REMAT(G), REMAT_D, SPLIT)
    ("fused b4 conv (r2 point)", 4, "conv", "same", "0"),
    ("split b4 g=conv d=none", 4, "conv", "none", "1"),
    ("split b8 g=conv d=none", 8, "conv", "none", "1"),
    ("split b8 g=none d=none", 8, "none", "none", "1"),
    ("split b6 g=conv d=none", 6, "conv", "none", "1"),
]


def main() -> None:
    results = []
    for label, batch, remat, remat_d, split in CONFIGS:
        env = dict(
            os.environ,
            OTM_BENCH_SIZE="512",
            OTM_BENCH_BATCH=str(batch),
            OTM_BENCH_REMAT=remat,
            OTM_BENCH_REMAT_D=remat_d,
            OTM_BENCH_SPLIT=split,
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
        print(f"{label:28s} {val}")


if __name__ == "__main__":
    main()
