#!/bin/bash
# One-shot TPU session: run the moment the axon tunnel recovers.
# Chains (1) fused-decode on-chip verification + block sweep,
# (2) a full bench.py pass (also warms the persistent XLA cache for the
# new offline/B=64 phases).  Tee everything for the record.
# NEVER run concurrently with the test suite (one host core).
set -uo pipefail
cd "$(dirname "$0")/.."
echo "=== tpu_session $(date -u +%FT%TZ) ==="
echo "--- verify_decode_tpu ---"
timeout 3600 python -m scripts.verify_decode_tpu "$@" 2>&1 | tail -40
echo "--- bench ---"
BENCH_FIRST_CONTACT_S=900 timeout 5400 python bench.py 2>&1 | tail -5
echo "=== done $(date -u +%FT%TZ) ==="
