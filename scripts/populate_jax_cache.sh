#!/usr/bin/env bash
# Populate the persistent XLA compilation cache (.jax_cache) by running the
# test suite one file per process. A fresh process per file keeps each run
# far below the accumulated-compilation threshold where this image's
# XLA:CPU JIT segfaults; afterwards a full serial `pytest tests/` run is
# nearly compile-free and safe.
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
    echo "== $f"
    timeout 3000 python -m pytest "$f" -q -p no:cacheprovider || fail=1
done
exit $fail
