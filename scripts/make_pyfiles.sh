#!/usr/bin/env bash
# Package the engine for cluster submission:
#   ./scripts/make_pyfiles.sh && spark-submit --py-files dist/yaschva_spark.zip job.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/yaschva_spark.zip
zip -qr dist/yaschva_spark.zip yaschva_spark -x '*__pycache__*'
echo "dist/yaschva_spark.zip"
