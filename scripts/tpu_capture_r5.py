"""One-command round-5 TPU measurement capture.

The round-5 queue (VERDICT r4 #1b, #6, #7, #8), most-important first,
tolerating partial failure and re-probing the tunnel between stages:

1. bench.py 256² flagship anchor (path every step — the official number's
   program family).
2. bench.py 256² with tpu.path_interval = 4 and 2 — the lazy
   path-length-regularization lever (VERDICT r4 #1).
3. bench.py 512² split-phase anchor (folded into every round's capture
   per VERDICT r4 #8).
4. bench.py 512² split-phase with path_interval = 4 — the credible route
   to the >=9 img/s 512² aim (VERDICT r4 #6).
5. scripts/fid_weights_probe.py — turns Inception-weight availability
   into comparability evidence automatically (VERDICT r4 #7).
6. scripts/prod_throughput.py — production-loop cross-check.

Each stage's stdout/stderr append to docs/captures/r5_capture.log (a
tracked path — ADVICE r4: capture evidence must survive the session).
Usage:

    nohup python scripts/tpu_capture_r5.py > /tmp/r5_capture.out 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
LOG = ROOT / "docs" / "captures" / "r5_capture.log"

_512 = {
    "OTM_BENCH_SIZE": "512",
    "OTM_BENCH_BATCH": "4",
    "OTM_BENCH_SPLIT": "1",
    "OTM_BENCH_REMAT": "none",
    "OTM_BENCH_REMAT_D": "none",
    "OTM_BENCH_STEPS": "16",
}

STAGES = [
    ("bench_256", [sys.executable, "bench.py"], {}, 3600),
    ("bench_256_path4", [sys.executable, "bench.py"],
     {"OTM_BENCH_PATH_INTERVAL": "4", "OTM_BENCH_STEPS": "20"}, 3600),
    ("bench_256_path2", [sys.executable, "bench.py"],
     {"OTM_BENCH_PATH_INTERVAL": "2", "OTM_BENCH_STEPS": "20"}, 3600),
    ("bench_512_split", [sys.executable, "bench.py"], dict(_512), 3600),
    ("bench_512_split_path4", [sys.executable, "bench.py"],
     {**_512, "OTM_BENCH_PATH_INTERVAL": "4"}, 3600),
    ("fid_weights_probe", [sys.executable, "scripts/fid_weights_probe.py"],
     {}, 1200),
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
    return out.returncode == 0 and "tpu" in (out.stdout + out.stderr).lower()


def main() -> None:
    only = os.environ.get("OTM_CAPTURE_ONLY")
    if not probe():
        print("TPU tunnel DOWN (probe failed); not starting the queue.")
        sys.exit(3)
    print("TPU tunnel UP; capturing the round-5 queue.", flush=True)
    results: dict[str, str] = {}
    LOG.parent.mkdir(parents=True, exist_ok=True)
    with LOG.open("a") as log:
        for name, cmd, env_extra, timeout_s in STAGES:
            if only and only not in name:
                continue
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
            log.flush()
            print(f"    {results[name]}", flush=True)
            if name != STAGES[-1][0] and not probe():
                print("tunnel died mid-queue; stopping.", flush=True)
                break
    print("\n===== capture summary")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
