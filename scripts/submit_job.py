"""Cluster-submission entry point (north-rule packaging clause).

Run via:
    ./scripts/make_pyfiles.sh
    spark-submit --master local[8] --py-files dist/yaschva_spark.zip \
        scripts/submit_job.py --rows 20000 --out /tmp/yv_submit_out

The job imports the engine ONLY from the shipped zip (no repo on
PYTHONPATH), builds the synthetic code table, runs the full validation
pipeline (validate + violation sink + uniqueness + RI + manifest), and
prints one JSON result line — the same shape a production submit would use
against an Iceberg catalog table (swap the source via yaschva_spark.io).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-buckets", type=int, default=8)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("yaschva_spark_submit").getOrCreate()

    # imports resolve from --py-files (the zip ships the whole package)
    from yaschva_spark.fixtures import code_files, repos_dim
    from yaschva_spark.pipeline import run_validation_job

    code = code_files(spark, args.rows, seed=42)
    result = run_validation_job(
        spark, code, repos_dim(spark), args.out, n_buckets=args.n_buckets
    )
    print(
        json.dumps(
            {
                "n_rows": result.n_rows,
                "n_invalid_rows": result.n_invalid_rows,
                "n_violations": result.n_violations,
                "n_dup_keys": result.n_dup_keys,
                "n_orphans": result.n_orphans,
                "buckets": result.n_buckets_processed,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
