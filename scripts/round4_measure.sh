#!/bin/bash
# Round-4 TPU measurement battery — run when the tunnel recovers.
# Serializes all device-heavy work (ONE chip, shared HBM); each step logs to
# /tmp/r4_measure/. Run with: setsid nohup bash scripts/round4_measure.sh &
set -u
OUT=/tmp/r4_measure
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))" >> "$OUT/driver.log"
  timeout 3000 "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ($(date -u +%H:%M:%S))" >> "$OUT/driver.log"
}

step bench_all       python bench.py --all
step extraction      python scripts/probe_extraction.py
step hybrid_1m       python scripts/hybrid_scale.py
step budget_recall   python scripts/budget_recall.py
step entry           python __graft_entry__.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$OUT/driver.log"
