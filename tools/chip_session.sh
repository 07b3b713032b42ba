#!/bin/bash
# Full chip measurement program for the pending round-3 items, in priority
# order (run when the axon relay returns; logs land in /tmp/chip_session):
#   1. DT-CWT fast_dots A/B  -> flip DtcwtKey/DtcwtImg defaults if >~15% win
#   2. flagship int_path A/B -> flip DwtDctSvd default if the win is real
#   3. full bench_suite --repeat 3 (refreshes bench_suite_report.json with
#      whatever defaults the A/Bs decided)
#   4. bench.py (the driver metric, warm cache)
# Each step is bounded; a dead relay fails the step instead of hanging.
set -o pipefail
cd /root/repo || exit 1
mkdir -p /tmp/chip_session
{
  echo "=== chip_session start $(date -u +%FT%TZ) ==="
  echo "--- Mosaic DEFAULT-precision probe ---"
  timeout 1200 python tools/probe_precision.py 2>&1
  echo "--- fastdots A/B ---"
  timeout 2400 python tools/bench_fastdots.py 2>&1
  echo "--- intpath A/B ---"
  timeout 2400 python tools/bench_intpath.py 2>&1
  echo "--- wire A/B: hls_workflow over the relay, f16 vs u8 (host is in the suite) ---"
  timeout 1200 env VFP_LL_WIRE=f16 python bench_suite.py --only hls_workflow 2>&1 | tail -3
  timeout 1200 env VFP_LL_WIRE=u8 python bench_suite.py --only hls_workflow 2>&1 | tail -3
  echo "=== A/Bs done $(date -u +%FT%TZ) — decide defaults before the suite ==="
  echo "    then: python bench_suite.py --repeat 3   (refreshes ALL entries,"
  echo "    incl. hls_workflow_host / leak_trace_host), then python bench.py,"
  echo "    then refresh the numbers in CLAUDE.md / DESIGN.md / README.md"
} 2>&1 | tee /tmp/chip_session/ab.log
