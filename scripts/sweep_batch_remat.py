"""Operating-point search: fused-step throughput vs (batch, remat mode).

The BASELINE.md probe table shows conv rates climbing steeply with batch
(64ch@256² 50->66 TFLOPs from b16->b48; deep levels 95->131). Batch >=32
at 256² OOMs without remat; tpu.remat="conv" saves only conv outputs, so
this sweep finds the best throughput point on the 16GB chip.

Usage: python scripts/sweep_batch_remat.py [points...] where a point is
"batch:remat" e.g. 16:none 32:conv 48:conv. Defaults cover the frontier.
"""

import json
import subprocess
import sys

DEFAULT_POINTS = ["16:none", "16:conv", "32:conv", "48:conv", "64:conv"]


def main() -> None:
    points = sys.argv[1:] or DEFAULT_POINTS
    results = []
    for point in points:
        batch, remat = point.split(":")
        env = {
            "OTM_BENCH_BATCH": batch,
            "OTM_BENCH_REMAT": remat,
            "OTM_BENCH_STEPS": "30",
            "OTM_BENCH_STEPS_PER_CALL": "10",
        }
        import os

        proc = subprocess.run(
            [sys.executable, "bench.py"],
            env={**os.environ, **env},
            capture_output=True,
            text=True,
            timeout=3000,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            value = json.loads(line)["value"]
        except (json.JSONDecodeError, KeyError, IndexError):
            value = None
            print(f"point {point} FAILED:\n{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}")
        results.append({"batch": int(batch), "remat": remat, "img_per_sec": value})
        print(json.dumps(results[-1]), flush=True)
    best = max((r for r in results if r["img_per_sec"]), key=lambda r: r["img_per_sec"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
