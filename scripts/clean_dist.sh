#!/usr/bin/env bash
set -euo pipefail
# Remove build artifacts (reference analog: scripts/clean_pyinstaller.sh).
ROOT_DIR="$(cd -- "$(dirname -- "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$ROOT_DIR"
rm -rf build dist ./*.egg-info lut_renderer_tpu.egg-info native/build
echo "cleaned build/, dist/, egg-info, native/build"
