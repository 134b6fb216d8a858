#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/dane_feature_engine.zip
zip -qr dist/dane_feature_engine.zip dane_visual_feature_extraction_worker_spark \
    -x '*/__pycache__/*'
echo "built dist/dane_feature_engine.zip ($(du -h dist/dane_feature_engine.zip | cut -f1))"
