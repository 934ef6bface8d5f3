#!/usr/bin/env bash
# One-window on-chip measurement session, for when the axon tunnel is
# flaky: probe the device with a bounded timeout, then run every pending
# on-device artifact in priority order, logging to /tmp/onchip_session.
#
#   bash benchmarks/run_onchip_session.sh
#
# Exit 2 = tunnel unreachable (nothing run). Individual step failures do
# not abort later steps; check the logs.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/onchip_session
mkdir -p "$LOG"

echo "[probe] bounded device-init check..."
if ! timeout 240 python - <<'EOF' > "$LOG/probe.log" 2>&1
import jax
print(jax.devices())
EOF
then
  echo "[probe] tunnel unreachable (see $LOG/probe.log)"; exit 2
fi
echo "[probe] device up: $(tail -1 $LOG/probe.log)"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[$name] running (timeout ${to}s)..."
  if timeout "$to" "$@" > "$LOG/$name.log" 2>&1; then
    echo "[$name] OK"; tail -3 "$LOG/$name.log" | sed "s/^/[$name]   /"
  else
    echo "[$name] FAILED/timeout (see $LOG/$name.log)"
    tail -3 "$LOG/$name.log" | sed "s/^/[$name]   /"
  fi
}

# 1. headline bench (writes the JSON line the driver records)
run bench 3000 python bench.py
# 2. bf16-consts bit-identity probe (staged claim from the last session)
run bf16consts 2400 python benchmarks/check_bf16_consts.py
# 3. authoritative per-config table (BASELINE.md)
run bench_all 6000 python benchmarks/bench_all.py
echo "[done] logs in $LOG"
