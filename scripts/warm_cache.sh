#!/usr/bin/env bash
# Warm the persistent XLA compilation cache for bench.py (and the inference engine).
#
# The engine program costs ~4.5 min of XLA:TPU compile cold; the cache (repo-local
# .jax_cache, shared with bench.py) makes subsequent runs start in seconds. Run this once
# after cloning / after a JAX upgrade; bench.py then reports compile_s < 30.
set -euo pipefail
cd "$(dirname "$0")/.."
PFPP_BENCH_REPEATS="${PFPP_BENCH_REPEATS:-1}" python bench.py "$@"
echo "cache warmed: $(du -sh .jax_cache 2>/dev/null | cut -f1) in .jax_cache"
