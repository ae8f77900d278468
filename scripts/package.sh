#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north_star packaging contract).
#
#   ./scripts/package.sh            -> dist/gonova.zip
#   spark-submit --master <...> --py-files dist/gonova.zip \
#       jobs/extract_job.py <pages_source> <output> <checkpoint> [run_id] [N]
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/gonova.zip
zip -qr dist/gonova.zip gonova_document_parser_spark -x '*/__pycache__/*'
echo "wrote dist/gonova.zip ($(du -h dist/gonova.zip | cut -f1))"
