"""Per-stage scaling profile of the validation job.

Times each action of run_validation_job separately — mirroring the
CURRENT pipeline stage shapes (fingerprint-shuffle uniqueness, RI fused
into the manifest agg as a broadcast probe, non-outer explode without a
pre-filter) — at one parallelism level; run it at two levels and compare
per-stage speedups to find where the N -> 4N efficiency is lost.

Usage: python scripts/profile_stages.py --master local[8] --shuffle 16 \
    --data .bench/code_8000000_42 [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--shuffle", type=int, required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from yaschva_spark import checks
    from yaschva_spark.engine import PASS_COL, VIOLATIONS_COL, validate_table
    from yaschva_spark.fixtures import CODE_SCHEMA, repos_dim
    from yaschva_spark.pipeline import BUCKET_COL, add_bucket
    from yaschva_spark.session import get_spark

    spark = get_spark(
        app_name="yv_profile", master=args.master, shuffle_partitions=args.shuffle
    )
    code = spark.read.parquet(args.data)
    repos = repos_dim(spark)

    def stages(out: str) -> dict:
        t: dict[str, float] = {}

        def clock(name, fn):
            t0 = time.monotonic()
            fn()
            t[name] = round(time.monotonic() - t0, 3)

        df = add_bucket(code, 64)
        validated = validate_table(df, CODE_SCHEMA, ignore_columns=(BUCKET_COL,))

        # no filter(~pass): the non-outer explode drops passing rows and a
        # pre-filter would evaluate the violations expression twice
        viol = (
            validated
            .select(
                F.col(BUCKET_COL).alias("bucket"),
                "repo", "path", "commit",
                F.sha2(F.col("content"), 256).alias("content_sha"),
                F.explode(VIOLATIONS_COL).alias("v"),
            )
            .select("bucket", "repo", "path", "commit", "content_sha",
                    "v.path", "v.rule", "v.error", "v.value")
            .toDF("bucket", "repo", "path", "commit", "content_sha",
                  "field_path", "rule", "error", "value")
        )
        clock("violations_write", lambda: viol.repartition("bucket")
              .write.mode("append").partitionBy("bucket").parquet(out + "/violations"))

        # the pipeline's uniqueness is the 128-bit fingerprint shuffle, not
        # a groupBy over the raw string keys (~5x more shuffle bytes)
        clock("uniqueness_fp", lambda: checks.duplicate_key_fingerprints(
            validated.select("repo", "path", "commit"), ["repo", "path", "commit"]
        ).agg(
            F.count(F.lit(1)).alias("n_dup_keys"),
            F.coalesce(F.sum("dup_count"), F.lit(0)).alias("n_dup_rows"),
        ).collect())

        # RI rides the manifest agg as a broadcast left join (no separate
        # job in the pipeline) — profile the fused stage, not a standalone
        # anti-join
        dim_keys = F.broadcast(
            repos.select(F.col("repo").alias("__dim_repo")).dropDuplicates(["__dim_repo"])
        )
        with_dim = validated.join(
            dim_keys, validated["repo"] == F.col("__dim_repo"), "left"
        )
        manifest = (
            with_dim.groupBy(F.col(BUCKET_COL).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum((~F.col(PASS_COL)).cast("long")).alias("n_invalid_rows"),
                F.sum(F.size(VIOLATIONS_COL)).alias("n_violations"),
                F.sum(F.col("__dim_repo").isNull().cast("long")).alias("n_orphans"),
                F.approx_count_distinct("repo").alias("n_repos"),
                F.bit_xor(
                    F.conv(F.substring(F.sha2(F.col("content"), 256), 1, 15), 16, 10)
                    .cast("long")
                ).alias("content_digest"),
                F.current_timestamp().alias("processed_at"),
            )
        )
        clock("manifest_write", lambda: manifest.write.mode("append")
              .parquet(out + "/manifest"))
        t["total"] = round(sum(t.values()), 3)
        return t

    # warmup
    out = tempfile.mkdtemp(prefix="yv_prof_")
    stages(out)
    shutil.rmtree(out, ignore_errors=True)

    runs = []
    for _ in range(args.reps):
        out = tempfile.mkdtemp(prefix="yv_prof_")
        runs.append(stages(out))
        shutil.rmtree(out, ignore_errors=True)
    keys = runs[0].keys()
    med = {k: sorted(r[k] for r in runs)[len(runs) // 2] for k in keys}
    print(json.dumps({"master": args.master, "median": med, "runs": runs}))


if __name__ == "__main__":
    main()
