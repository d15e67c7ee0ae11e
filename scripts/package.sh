#!/usr/bin/env bash
# Build the --py-files zip for spark-submit deployment.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/loongcollector_spark.zip
# library only — no tests, no caches
find loongcollector_spark -name '__pycache__' -prune -o -name '*.py' -print \
  | zip -q dist/loongcollector_spark.zip -@
echo "dist/loongcollector_spark.zip:"
unzip -l dist/loongcollector_spark.zip | tail -2
