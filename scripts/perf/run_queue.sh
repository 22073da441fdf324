#!/bin/bash
# Roadmap TPU measurement queue (docs/roadmap.md "TPU measurement queue").
# One config per process, ascending sizes, generous timeouts, never two
# TPU clients at once. Logs to /tmp/queue.log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/queue.log
: > "$LOG"

run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> "$LOG"
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$LOG"
}

# 1. aliased seg-gmax validation at 2.21M (8 segs vs 1)
run python scripts/perf/score_path_phases.py a3seg 2210456 128 1000 8
run python scripts/perf/score_path_phases.py a3seg 2210456 128 1000 1
# 2. tree-routing validation
run python scripts/perf/score_path_phases.py rescseg 2210456 128 1000 8
run python scripts/perf/score_path_phases.py rescseg 2210456 128 1000 1
# 3. whole-path segment overhead at 6.63M
run python scripts/perf/score_path_phases.py plain 6631367 128 1000 2
run python scripts/perf/score_path_phases.py plain 6631367 128 1000 8
# 4. 8.8M rungs
# NOTE (historical, r3): the 4-segment config below was later proven
# fragmentation-blocked on this tunnel (bench_state.json upgrade_fails)
# — re-running it fails allocation and leaks HBM until the server
# reclaim. Kept as the record of the r3 queue; use --segs 6 (proven)
# or omit --segs (resolves bench.default_segs) for new measurements.
run python bench.py --rung 8841823 --segs 4
run python bench.py --rung 8841823 --segs 8
# 5. wide shape
run python bench.py --rung 8841823 --segs 8 --qchip 256
echo "QUEUE DONE $(date -u +%H:%M:%S)" >> "$LOG"
