#!/bin/bash
# Container entrypoint (reference: entrypoint.sh). Env-driven so the same
# image serves TPU production and CPU smoke deployments:
#
#   BACKEND=tpu|cpu        device selection (cpu sets JAX_PLATFORMS=cpu)
#   CHECKPOINT_PATH=...    model directory (default /app/checkpoints/s2-pro-tpu)
#   POOL_SIZE=N            continuous-batching decode slots (default 16)
#   API_KEY=...            optional bearer-token auth
#   EXTRA_ARGS=...         appended verbatim to the server CLI
set -e

BACKEND="${BACKEND:-tpu}"
CHECKPOINT_PATH="${CHECKPOINT_PATH:-/app/checkpoints/s2-pro-tpu}"
POOL_SIZE="${POOL_SIZE:-16}"

ARGS=(--listen 0.0.0.0:8080 --pool-size "${POOL_SIZE}")

if [ "${BACKEND}" = "cpu" ]; then
    export JAX_PLATFORMS=cpu
    ARGS+=(--cpu)
fi

if [ -d "${CHECKPOINT_PATH}" ]; then
    ARGS+=(--checkpoint-path "${CHECKPOINT_PATH}")
else
    echo "entrypoint: no checkpoint at ${CHECKPOINT_PATH}, starting --tiny" >&2
    ARGS+=(--tiny)
fi

if [ -n "${API_KEY}" ]; then
    ARGS+=(--api-key "${API_KEY}")
fi

exec python -m fish_speech_tpu.server.main "${ARGS[@]}" ${EXTRA_ARGS}
