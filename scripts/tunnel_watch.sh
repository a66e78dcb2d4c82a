#!/bin/bash
# Probe the axon TPU tunnel every 3 minutes; exit 0 the moment a device answers.
# Run in background; the exit signals "tunnel is up — run scripts/round3_measure.sh".
while true; do
  if timeout 110 python -c "import jax; d=jax.devices(); assert d, 'no devices'; print('TUNNEL UP:', d)" 2>/dev/null; then
    echo "tunnel responded at $(date -u +%FT%TZ)"
    exit 0
  fi
  echo "tunnel still down at $(date -u +%FT%TZ)"
  sleep 180
done
