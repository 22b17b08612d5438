"""Single-configuration scaling run: the full validation job at one
parallelism level, warm-median timing. Spawned as a fresh process per config
by bench_scaling.py (a JVM can't change its core count mid-flight).

Usage:
  python scripts/scaling_runner.py --master local[8] --shuffle 16 \
      --data .bench/code_4000000_42 [--reps 3]

Prints one JSON line: {"master": ..., "rows": N, "median_sec": s,
"rows_per_sec": r, "runs": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--shuffle", type=int, required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from yaschva_spark.fixtures import repos_dim
    from yaschva_spark.pipeline import run_validation_job
    from yaschva_spark.session import get_spark

    # shuffle spills and the job's output sinks go to tmpfs: on a real
    # cluster every executor brings its own local SSD (disk bandwidth scales
    # with N), but this sandbox has ONE virtual disk shared by all threads —
    # leaving shuffle/sink on it would measure disk contention, not the
    # job's scaling. Input parquet stays on disk (page-cache warm).
    shm = "/dev/shm/yv_scaling"
    os.makedirs(shm, exist_ok=True)
    spark = get_spark(
        app_name=f"yv_scaling_{args.master}",
        master=args.master,
        shuffle_partitions=args.shuffle,
        extra_conf={"spark.local.dir": os.path.join(shm, "local")},
    )
    code = spark.read.parquet(args.data)
    repos = repos_dim(spark)
    n_rows = code.count()

    def one_run() -> float:
        out = tempfile.mkdtemp(prefix="yv_scale_", dir=shm)
        try:
            t0 = time.monotonic()
            run_validation_job(spark, code, repos, out, n_buckets=64)
            return time.monotonic() - t0
        finally:
            shutil.rmtree(out, ignore_errors=True)

    one_run()  # warmup: JIT + page cache
    runs = [one_run() for _ in range(args.reps)]
    median = sorted(runs)[len(runs) // 2]
    print(
        json.dumps(
            {
                "master": args.master,
                "shuffle_partitions": args.shuffle,
                "rows": n_rows,
                "median_sec": round(median, 3),
                "rows_per_sec": round(n_rows / median, 1),
                "runs": [round(r, 3) for r in runs],
            }
        )
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
