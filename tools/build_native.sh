#!/usr/bin/env bash
# Build the native host runtime helpers (native/liblc3tpu_host.so).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
g++ -O3 -fPIC -shared -o "$REPO/native/liblc3tpu_host.so" "$REPO/native/lc3tpu_host.cpp"
echo "built $REPO/native/liblc3tpu_host.so"
