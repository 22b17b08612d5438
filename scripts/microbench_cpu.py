"""Pure-CPU thread-scaling microbenchmark for the host.

Measures what the machine itself can deliver at different local[N] thread
counts on compute that has no I/O, no shuffle, and no Python — an upper
bound on any job's scaling efficiency at those thread counts. Used to pick
the honest N for the N -> 4N protocol (BENCH/BASELINE.md).

Usage: python scripts/microbench_cpu.py [threads...]   (default 1 2 4 8 32)
Each thread count runs in a fresh JVM (subprocess) — a JVM cannot change its
core count mid-flight.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORK_ROWS = 6_000_000


def _one(threads: int) -> float:
    code = f"""
import time
from yaschva_spark.session import get_spark
spark = get_spark(app_name="yv_micro", master="local[{threads}]", shuffle_partitions={threads})
from pyspark.sql import functions as F
df = spark.range(0, {WORK_ROWS}, 1, 64)
expr = F.bit_xor(F.conv(F.substring(F.sha2(F.col("id").cast("string"), 256), 1, 15), 16, 10).cast("long"))
df.agg(expr).collect()  # warmup (JIT)
best = 1e9
for _ in range(3):
    t0 = time.monotonic()
    df.agg(expr).collect()
    best = min(best, time.monotonic() - t0)
print("RESULT", best)
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=REPO,
        env=dict(os.environ, PYTHONPATH=REPO), timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1])
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    threads = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 32]
    res = {t: round(_one(t), 3) for t in threads}
    base = min(threads)
    print(json.dumps({
        "sec": res,
        "speedup_vs_min": {t: round(res[base] / res[t], 2) for t in threads},
    }))


if __name__ == "__main__":
    main()
