#!/usr/bin/env bash
# Launch N preemptible (spot) TPU VMs that each run the pydem_tpu
# cloud-burst worker against a shared queue, restarting on boot after
# preemption.  Runnable counterpart of the recipe in docs/CLOUD.md and of
# the reference's aws/ scaffolding (handler.py / mk_dist.sh).
#
# Usage:
#   deploy/cloud/launch_tpu_vm.sh <n_vms> <queue-path-on-shared-fs> \
#       [zone] [accelerator] [image]
#
# Prereqs: a shared filesystem (Filestore/NFS or gcsfuse bucket) mounted
# at the same path on every VM; the pydem-tpu image pushed (deploy/
# Dockerfile — its build aborts unless the pipeline reproduces the
# committed goldens bitwise).
set -euo pipefail

N=${1:?n_vms}
QUEUE=${2:?queue path on the shared filesystem}
ZONE=${3:-us-central2-b}
ACCEL=${4:-v5litepod-1}
IMAGE=${5:-my-registry/pydem-tpu:latest}

STARTUP=$(cat <<EOF
#!/bin/bash
# re-runs on every boot -> automatic resume after preemption
docker run --privileged --net=host -v /mnt/shared:/mnt/shared ${IMAGE} \
  python /opt/pydem_tpu/deploy/cloud/worker.py --queue ${QUEUE}
EOF
)

for i in $(seq 1 "$N"); do
  gcloud compute tpus tpu-vm create "pydem-burst-$i" \
    --zone "$ZONE" \
    --accelerator-type "$ACCEL" \
    --version tpu-ubuntu2204-base \
    --spot \
    --metadata startup-script="$STARTUP" &
done
wait
echo "launched $N spot TPU VM workers against queue $QUEUE"
echo "watch:   python deploy/cloud/submit.py --queue $QUEUE --status"
echo "teardown: gcloud compute tpus tpu-vm delete pydem-burst-{1..$N} --zone $ZONE"
