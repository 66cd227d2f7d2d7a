#!/bin/bash
# Round-5 on-chip measurement chain (single tunneled TPU => serialized).
# Assumes scripts/tpu_flagship_longrun.py (PSLD_R3_DIR=/tmp/psld_r5) has
# produced the round-5 flagship checkpoint. Stages: sampler-quality
# matrix -> perf phases (256px levers, adaptive_ode rows, train-gap
# attribution) -> reduced-output score_m end-to-end. Each stage retries
# after a tunnel crash; between processes we sleep for worker recovery.
export PYTHONPATH=/root/repo:/root/.axon_site
export MALLOC_MMAP_THRESHOLD_=1073741824
export PSLD_R5_DIR=/tmp/psld_r5
cd /root/repo

run() {
  name=$1; shift
  for attempt in 1 2 3; do
    echo "=== [$name] attempt $attempt $(date -u +%H:%M:%S) ==="
    "$@"
    rc=$?
    if [ $rc -eq 0 ]; then
      echo "=== [$name] OK $(date -u +%H:%M:%S) ==="
      return 0
    fi
    echo "=== [$name] rc=$rc (attempt $attempt); sleeping 75s for the tunnel ==="
    sleep 75
  done
  echo "=== [$name] GAVE UP ==="
  return 1
}

run matrix    python scripts/tpu_r5_matrix.py            || true
run adaptive  python scripts/tpu_r5_perf.py adaptive     || true
run hires     python scripts/tpu_r5_perf.py hires        || true
run trainattr python scripts/tpu_r5_perf.py trainattr    || true
run scorem    python scripts/tpu_r5_scorem.py            || true
echo "=== R5 CHAIN DONE $(date -u) ==="
