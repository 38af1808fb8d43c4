"""Hardware-ceiling calibration for the 2v8 scaling harness.

The north-rule scaling criterion divides throughput at 4N cores by 4x the
throughput at N cores — which silently assumes the HOST can deliver 4x
more work at 4N busy cores.  On this shared 32-core VM that assumption
fails in some windows (hypervisor steal, neighbor memory-bandwidth
pressure, frequency behavior under wide load), deflating the 8-core leg
while the 2-core leg runs at full speed.  This tool measures the host's
OWN 2->8-core scaling on two Spark-free microkernels in the same window
as a scaling run, so the engine's efficiency can be read against the
hardware ceiling actually available that day:

- ``alu``: hashlib.md5 over a 64 KiB buffer per iteration — core-local,
  frequency-bound, no memory traffic (upper bound for cache-resident work)
- ``mem``: numpy sum over a 64 MiB float64 array per iteration — DRAM
  bandwidth-bound (lower bound; Spark's Arrow/shuffle paths sit between)

Method: P worker processes pinned with taskset to cores 0..P-1, each
counting iterations for a fixed wall window; total iterations/s at P=2
and P=8; ceiling = rate(8) / (4 * rate(2)).  Output: one JSON line, and
--out to also write a file.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _worker(kind: str, seconds: float) -> None:
    n = 0
    if kind == "alu":
        import hashlib

        buf = os.urandom(65536)
        end = time.perf_counter() + seconds
        while time.perf_counter() < end:
            hashlib.md5(buf).digest()
            n += 1
    else:
        import numpy as np

        arr = np.random.default_rng(0).random(8 * 1024 * 1024)  # 64 MiB
        end = time.perf_counter() + seconds
        while time.perf_counter() < end:
            arr.sum()
            n += 1
    print(n)


def _measure(kind: str, cores: int, seconds: float) -> float:
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable,
             os.path.abspath(__file__), "--worker", kind, str(seconds)],
            stdout=subprocess.PIPE, text=True,
        )
        for i in range(cores)
    ]
    total = 0
    for p in procs:
        out, _ = p.communicate(timeout=seconds + 60)
        total += int(out.strip().splitlines()[-1])
    return total / seconds


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], float(sys.argv[3]))
        return
    seconds = 10.0
    out_path = None
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--seconds":
            seconds = float(args[i + 1])
        if a == "--out":
            out_path = args[i + 1]
    result = {"seconds_per_leg": seconds, "pair": [2, 8],
              "load1_before": round(os.getloadavg()[0], 2)}
    for kind in ("alu", "mem"):
        r2 = _measure(kind, 2, seconds)
        r8 = _measure(kind, 8, seconds)
        result[kind] = {
            "rate_2core": round(r2, 1),
            "rate_8core": round(r8, 1),
            "ceiling_2v8": round(r8 / (4 * r2), 3),
        }
    result["load1_after"] = round(os.getloadavg()[0], 2)
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
