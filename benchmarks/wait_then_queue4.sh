#!/bin/bash
# Probe the TPU until a full dispatch+readback round-trip succeeds, then
# launch run_r5_queue4.sh. Used after a session kill left the device
# grant held (readback blocks while enumeration/dispatch still work).
cd /root/repo
for i in $(seq 1 40); do
  timeout 180 python - <<'EOF'
import jax, numpy as np
x = jax.numpy.ones((256, 256))
print("probe ok", float(np.asarray((x @ x).mean())))
EOF
  rc=$?
  echo "== probe attempt $i rc=$rc =="
  if [ $rc -eq 0 ]; then
    exec bash benchmarks/run_r5_queue4.sh
  fi
  sleep 90
done
echo "== gave up waiting for the TPU =="
exit 1
