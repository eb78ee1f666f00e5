#!/usr/bin/env bash
# Package the dedup library for spark-submit --py-files (north_rule:
# "run via spark-submit --py-files on multi-executor clusters").
#
#   ./scripts/make_pyfiles_zip.sh [out.zip]
#   spark-submit --py-files dedup.zip dedup/cli.py --input ... --output ...
set -euo pipefail
out="${1:-dedup.zip}"
cd "$(dirname "$0")/.."
rm -f "$out"
zip -qr "$out" dedup -i 'dedup/*.py'
echo "wrote $out"
unzip -l "$out" | tail -3
