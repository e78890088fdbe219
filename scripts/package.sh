#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/contextinator_spark.zip
mkdir -p dist
zip -qr dist/contextinator_spark.zip contextinator_spark -x '*__pycache__*'
echo "dist/contextinator_spark.zip"
