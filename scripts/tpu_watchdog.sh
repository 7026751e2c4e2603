#!/bin/bash
# Poll the axon TPU backend; when it answers, fire the hardware campaign
# (scripts/tpu_campaign.sh) exactly once.  Safe to leave running across an
# outage: each probe is a separate subprocess with a hard timeout, so a
# hanging backend init never wedges the watchdog itself.
#
#   bash scripts/tpu_watchdog.sh [logdir] [poll_seconds]
set -u
LOG=${1:-/tmp/campaign}
POLL=${2:-300}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

note() { echo "$(date -u +%F' '%H:%M:%S) $*" | tee -a "$LOG/watchdog.log"; }

note "watchdog armed (poll ${POLL}s)"
while true; do
    if timeout 240 python - <<'EOF' >> "$LOG/watchdog.log" 2>&1
import os
os.environ.setdefault("JAX_PLATFORMS", "tpu")
import jax, jax.numpy as jnp
assert jax.default_backend() != "cpu"
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
print("probe ok:", jax.devices())
EOF
    then
        note "TPU HEALTHY — launching campaign"
        bash scripts/tpu_campaign.sh "$LOG" 2>&1 | tee -a "$LOG/watchdog.log"
        note "campaign finished"
        exit 0
    fi
    note "tpu still down"
    sleep "$POLL"
done
