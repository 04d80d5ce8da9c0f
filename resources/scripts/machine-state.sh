#!/bin/sh
# Host telemetry around perf runs (analog of the reference's
# resources/scripts/machine-state.sh probe used by its perf workflows).
echo "=== machine state $(date -u +%FT%TZ) ==="
uptime
free -m 2>/dev/null || vm_stat 2>/dev/null || true
nproc 2>/dev/null || sysctl -n hw.ncpu 2>/dev/null || true
cat /sys/class/thermal/thermal_zone*/temp 2>/dev/null || true
