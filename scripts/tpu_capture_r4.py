"""One-command round-4 TPU measurement capture.

The axon tunnel has been down for most of round 4; when it comes back the
window may be brief. This script captures the whole pending measurement
queue in one run, most-important first, tolerating partial failure:

1. bench.py at the 256² flagship point (the round's official number).
2. bench.py at the 512² split-phase operating point (round-3 reproduction).
3. scripts/sweep_512_gsplit.py — the VERDICT r3 #4 lever measurement.
4. scripts/bench_int8.py — int8 serving decode speedup.
5. scripts/prod_throughput.py — production-loop throughput cross-check.

Each stage's stdout/stderr append to /tmp/r4_capture.log and the JSON
result lines are echoed at the end. Probe-first discipline per CLAUDE.md:
a 110 s device probe gates the run. Usage:

    nohup python scripts/tpu_capture_r4.py > /tmp/r4_capture.out 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
LOG = Path("/tmp/r4_capture.log")

STAGES = [
    ("bench_256", [sys.executable, "bench.py"], {}, 3600),
    (
        "bench_512_split",
        [sys.executable, "bench.py"],
        {
            "OTM_BENCH_SIZE": "512",
            "OTM_BENCH_BATCH": "4",
            "OTM_BENCH_SPLIT": "1",
            "OTM_BENCH_REMAT": "none",
            "OTM_BENCH_REMAT_D": "none",
            "OTM_BENCH_STEPS": "16",
        },
        3600,
    ),
    ("sweep_512_gsplit", [sys.executable, "scripts/sweep_512_gsplit.py"], {}, 7200),
    ("bench_int8", [sys.executable, "scripts/bench_int8.py"], {}, 3600),
    ("prod_throughput", [sys.executable, "scripts/prod_throughput.py"], {}, 3600),
]


def probe(timeout_s: int = 110) -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    # Device repr varies across jaxlib versions ("TpuDevice", "[TPU v5 lite0]");
    # match case-insensitively. rc==0 alone would also do (axon init raises on
    # failure), but keep the string check against silent CPU fallback.
    return out.returncode == 0 and "tpu" in (out.stdout + out.stderr).lower()


def main() -> None:
    if not probe():
        print("TPU tunnel DOWN (probe failed); not starting the queue.")
        sys.exit(3)
    print("TPU tunnel UP; capturing the round-4 queue.", flush=True)
    results: dict[str, str] = {}
    with LOG.open("a") as log:
        for name, cmd, env_extra, timeout_s in STAGES:
            log.write(f"\n===== {name} @ {time.strftime('%H:%M:%S')}\n")
            log.flush()
            print(f"--- {name}", flush=True)
            env = {**os.environ, **env_extra}
            try:
                out = subprocess.run(
                    cmd,
                    cwd=ROOT,
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                    timeout=timeout_s,
                )
                log.write(out.stdout)
                tail = [
                    ln
                    for ln in out.stdout.splitlines()
                    if ln.startswith("{") or "img/s" in ln or "->" in ln
                ]
                results[name] = (
                    f"rc={out.returncode} " + " | ".join(tail[-6:])[:500]
                )
            except subprocess.TimeoutExpired:
                results[name] = "TIMEOUT"
            print(f"    {results[name]}", flush=True)
            # Re-probe between stages: if the tunnel died, stop burning
            # the window on guaranteed failures.
            if name != STAGES[-1][0] and not probe():
                print("tunnel died mid-queue; stopping.", flush=True)
                break
    print("\n===== capture summary")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
