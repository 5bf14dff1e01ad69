#!/usr/bin/env bash
set -euo pipefail

# Smoke-run the built wheel in a scratch environment (reference analog:
# scripts/run_built_app.sh): install the newest wheel from dist/ into a
# temp venv-less prefix and exercise `lut-tpu doctor`.

ROOT_DIR="$(cd -- "$(dirname -- "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$ROOT_DIR"

WHEEL="$(ls -t dist/*.whl | head -1)"
PREFIX="$(mktemp -d)"
trap 'rm -rf "$PREFIX"' EXIT

python -m pip install --no-deps --target "$PREFIX" "$WHEEL" >/dev/null
PYTHONPATH="$PREFIX" python -m lut_renderer_tpu.app.cli doctor
