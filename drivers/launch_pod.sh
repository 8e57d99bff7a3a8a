#!/usr/bin/env bash
# TPU-pod launch script — the cluster-submission artifact of this repo
# (the role of the reference's PBS jobfile, /root/reference/jobfile.pbs:
# resource selection, thread pinning, mpirun fan-out). On Cloud TPU the
# fan-out primitive is `gcloud compute tpus tpu-vm ssh --worker=all`: the
# SAME command runs on every host, and jax.distributed discovers peers
# from the TPU metadata (gppe_tpu.parallel.mesh.multihost_init(auto=True)
# delegates to jax.distributed.initialize()'s auto-detection).
#
# Usage:
#   ./drivers/launch_pod.sh <tpu-name> <zone> [driver args...]
# Example:
#   ./drivers/launch_pod.sh gppe-v5e-16 us-west4-1 \
#       drivers/scaling_efficiency.py --real
#
# Single-host (one chip / one VM) needs none of this — just run the
# driver; multihost_init is a no-op when jax.process_count() == 1.

set -euo pipefail

TPU_NAME="${1:?tpu name}"
ZONE="${2:?zone}"
shift 2
DRIVER="${*:-drivers/scaling_efficiency.py}"

REPO_DIR="${REPO_DIR:-\$HOME/gppe_tpu}"

# The reference pins OpenMP/BLAS threads for honest timing
# (examples/_utilities/processing_time_utilities.py:122-144); the JAX
# equivalents worth pinning on pod hosts:
ENV="TPU_STDERR_LOG_LEVEL=0 \
JAX_PLATFORMS=tpu \
XLA_FLAGS=--xla_tpu_enable_async_collective_fusion=true"

exec gcloud compute tpus tpu-vm ssh "${TPU_NAME}" \
  --zone "${ZONE}" \
  --worker=all \
  --command "cd ${REPO_DIR} && ${ENV} python ${DRIVER}"
