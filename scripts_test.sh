#!/bin/bash
# CPU-only test runner: skip axon TPU plugin registration (sitecustomize).
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
exec python -m pytest "$@"
