#!/usr/bin/env bash
# Full test suite across several FRESH pytest processes, auto-sharded.
#
# Why sharding at all: running all ~250 tests in ONE process segfaults
# deterministically near the end (rc=139) inside XLA:CPU
# backend_compile_and_load at a FRESH compile — reproduced with the
# persistent compile cache disabled, so it is accumulated in-process
# XLA/LLVM JIT state, not a cache artifact (first seen after round 3's
# full-unroll default increased per-compile code size; minimal repro note
# in docs/RESULTS.md "Test-suite segfault"). Every shard passes in a
# fresh process.
#
# Why AUTO-sharding (round 4): the previous version hard-coded a 4-file
# second shard chosen by hand — new test files silently pushed shard 1
# back over the cliff. Now every tests/test_*.py is bucketed
# deterministically (sorted, round-robin by file size as a cost proxy)
# into shards of at most SHARD_MAX_FILES files (default 10, ~1/3 of the
# count that crashed), so adding files grows the shard COUNT, not the
# per-process load. `pytest -m quick` remains the <5-minute tier.
set -uo pipefail
cd "$(dirname "$0")/.."

SHARD_MAX_FILES="${SHARD_MAX_FILES:-10}"

mapfile -t SHARDS < <(python - "$SHARD_MAX_FILES" <<'EOF'
import glob, os, sys

max_files = int(sys.argv[1])
files = sorted(glob.glob("tests/test_*.py"))
n_shards = max(1, -(-len(files) // max_files))  # ceil
# deterministic cost balance: biggest files first, round-robin
ranked = sorted(files, key=lambda f: (-os.path.getsize(f), f))
shards = [[] for _ in range(n_shards)]
for i, f in enumerate(ranked):
    shards[i % n_shards].append(f)
for s in shards:
    print(" ".join(sorted(s)))
EOF
)

FAILED=0
for i in "${!SHARDS[@]}"; do
  echo "=== shard $((i+1))/${#SHARDS[@]}: ${SHARDS[$i]}" >&2
  # shellcheck disable=SC2086
  python -m pytest ${SHARDS[$i]} -q "$@" || FAILED=1
done
exit $FAILED
