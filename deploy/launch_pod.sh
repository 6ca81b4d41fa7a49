#!/usr/bin/env bash
# Multi-host TPU pod-slice launch for the DELiVR-TPU pipeline
# (SURVEY.md §5.8; VERDICT r3 item 8).
#
# The pipeline's distribution layout:
#   - brains (independent volumes) are distributed across DCN slices /
#     hosts ('dp' axis, blob_detection.dcn_slices);
#   - each brain's sliding-window passes shard z-spatially across the
#     chips of its slice over ICI ('sp' axis, blob_detection.spatial_shards).
# Every host runs the SAME command; each host processes the brains whose
# slice index matches jax.process_index() (pipeline/runner.py).
#
# Usage (from your workstation, gcloud alpha/v2 TPU VMs):
#   ./deploy/launch_pod.sh <tpu-name> <zone> <config.json path on the VMs>
#
# Example for a v5e-16 (2 hosts × 8 chips) processing a cohort with
#   "blob_detection": {"dcn_slices": 2, "spatial_shards": 8}:
#   ./deploy/launch_pod.sh delivr-v5e-16 us-central1-a /data/config.json
#
# On clusters without TPU metadata discovery, set an explicit coordinator
# instead (the runner's maybe_initialize_distributed reads these):
#   DELIVR_COORDINATOR=host0:8476 DELIVR_NUM_PROCESSES=2 \
#   DELIVR_PROCESS_ID=$i python -m delivr_cfos_tpu /data/config.json
set -euo pipefail

TPU_NAME="${1:?tpu name}"
ZONE="${2:?zone}"
CONFIG="${3:?config.json path on the VMs}"

# --worker=all runs the command on every host of the pod slice; the TPU
# runtime env (TPU_WORKER_HOSTNAMES etc.) lets jax.distributed.initialize()
# discover the coordinator automatically — the runner calls it when these
# vars advertise a multi-worker slice.
exec gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
  --zone="$ZONE" \
  --worker=all \
  --command="DELIVR_DISTRIBUTED=1 python -m delivr_cfos_tpu '$CONFIG'"
