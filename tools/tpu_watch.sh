#!/bin/bash
# Poll TPU availability; when the axon tunnel answers, run the round-3
# validation sequence (tools/r3_validate.sh) once and exit.
# Status file: /tmp/tpu_watch_status (probing / validating / done / gave_up)
set -u
cd /root/repo
echo probing > /tmp/tpu_watch_status

probe() {
  timeout 420 python - <<'EOF' >/tmp/tpu_watch_probe.log 2>&1
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp_cache')
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != 'cpu', d
x = jnp.ones((8, 128))
print('TPU_OK', d, float((x @ x.T).sum()))
EOF
}

for i in $(seq 1 200); do
  if probe && grep -q TPU_OK /tmp/tpu_watch_probe.log; then
    echo validating > /tmp/tpu_watch_status
    bash tools/r3_validate.sh > /tmp/r3_validate_run.log 2>&1
    echo done > /tmp/tpu_watch_status
    exit 0
  fi
  sleep 120
done
echo gave_up > /tmp/tpu_watch_status
