#!/bin/bash
# Round-4 on-chip measurement chain (single tunneled TPU => serialized).
# Stages: demo prepare -> bf16 mode gates -> flagship 20k longrun ->
# 50k protocol on the flagship. Each stage retries after a tunnel crash
# (training stages auto-resume from `latest`).
export PYTHONPATH=/root/repo:/root/.axon_site
export MALLOC_MMAP_THRESHOLD_=1073741824
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

run prepare  python scripts/tpu_r3_prepare.py            || exit 1
run gates    python scripts/tpu_bf16_mode_gates.py       || true
run longrun  python scripts/tpu_flagship_longrun.py      || exit 1
PSLD_50K_MODEL=flagship run 50k python scripts/tpu_50k_protocol.py || exit 1
echo "=== CHAIN DONE $(date -u) ==="
run nfe1000 python scripts/tpu_r4_measure.py nfe1000_bs128 || true
echo "=== CHAIN FULLY DONE $(date -u) ==="
run ei3 python scripts/tpu_r4_measure.py ei3_identity || true
echo "=== CHAIN EXTRA DONE $(date -u) ==="
