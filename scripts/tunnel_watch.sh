#!/bin/bash
# Poll the axon tunnel relay and launch the round-4 chip chain the
# moment it comes back. Requires two consecutive healthy probes 30 s
# apart (the relay flaps while restarting). Exits after launching the
# chain, or after the deadline passes.
#
# Usage: bash scripts/tunnel_watch.sh [max_wait_hours=10] [ft_hours=3.0]

set -u
MAX_H=${1:-10}
FT_H=${2:-3.0}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
END=$(( $(date +%s) + $(python3 -c "print(int($MAX_H*3600))") ))

probe() {
  local CODE
  CODE=$(curl -s -m 5 -o /dev/null -w "%{http_code}" http://127.0.0.1:8083/ 2>/dev/null)
  [ "$CODE" != "000" ]
}

while [ "$(date +%s)" -lt "$END" ]; do
  if probe; then
    sleep 30
    if probe; then
      echo "WATCH[$(date -u +%H:%M:%S)]: tunnel up, launching chain" \
        >> /tmp/round4_chain.log
      exec bash "$REPO/scripts/round4_chain.sh" "$FT_H"
    fi
  fi
  sleep 60
done
echo "WATCH: deadline passed, tunnel never returned" >> /tmp/round4_chain.log
exit 2
