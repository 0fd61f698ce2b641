#!/usr/bin/env bash
# Build the WASM analytics module for the browser visualizer.
# Runs the native C++ tests first (mirrors the reference's build_wasm.bat
# which runs `cargo test --release` before `wasm-pack build`).
set -euo pipefail
cd "$(dirname "$0")/../cm3p_tpu/native"
make test
if command -v emcc >/dev/null; then
  make wasm
  cp cm3p_analytics.js cm3p_analytics.wasm ../../visualizer/ 2>/dev/null || cp cm3p_analytics.js ../../visualizer/
  echo "WASM module built and copied into visualizer/"
else
  echo "emcc not found: visualizer will use its pure-JS kernels (no WASM)."
fi
