#!/bin/bash
# Two-process MPC integration runner (the reference's run-integration.zsh role):
# launches both parties over TCP loopback and reports party 0's results.
set -u
cd "$(dirname "$0")/.."
PORT=${PORT:-9850}
FILTER=${1:-}

ARGS=()
[ -n "$FILTER" ] && ARGS+=(--test "$FILTER")

JAX_PLATFORMS=cpu BP_FORCE_BACKEND=host python integration/main.py --party 1 --port "$PORT" "${ARGS[@]}" &
P1=$!
JAX_PLATFORMS=cpu BP_FORCE_BACKEND=host python integration/main.py --party 0 --port "$PORT" "${ARGS[@]}"
STATUS=$?
wait $P1
exit $STATUS
