#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ufuzzy_spark.zip
zip -qr dist/ufuzzy_spark.zip ufuzzy_spark fixtures -x '*__pycache__*'
echo "dist/ufuzzy_spark.zip:"
unzip -l dist/ufuzzy_spark.zip | tail -2
