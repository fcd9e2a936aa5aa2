#!/bin/sh
# Build the --py-files artifact for spark-submit deployment (M8).
set -e
cd "$(dirname "$0")/.."
rm -f engine.zip
zip -qr engine.zip schema_drift_detector_spark -x '*__pycache__*'
echo "engine.zip:"
unzip -l engine.zip | tail -3
