#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r4 tasks #2, #5, #6, #7, #8).
# One config per process, never two TPU clients at once, settles between
# processes for the tunnel's HBM release lag. Logs to /tmp/queue_r4.log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${QUEUE_LOG:-/tmp/queue_r4.log}
: > "$LOG"

run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> "$LOG"
  timeout "${RUN_TIMEOUT:-2700}" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$LOG"
  sleep "${SETTLE:-150}"
}

# 1. training throughput at chip-filling shapes (VERDICT #5)
run python scripts/perf/train_bench.py 8 8                 # recipe row (re-measure)
run python scripts/perf/train_bench.py 32 8                # 256 passages
run python scripts/perf/train_bench.py 64 8                # 512 passages
run python scripts/perf/train_bench.py 64 8 --grad-cache
run python scripts/perf/train_bench.py 128 8 --grad-cache  # 1024 passages

# 2. gmax roofline at 2.21M (VERDICT #6): tile width + grid semantics
run python scripts/perf/score_path_phases.py a3tile 2210456 128 1000 256
run python scripts/perf/score_path_phases.py a3tile 2210456 128 1000 512
run python scripts/perf/score_path_phases.py a3tile 2210456 128 1000 1024
run env OPENMATCH_GMAX_PARALLEL=1 python scripts/perf/score_path_phases.py a3tile 2210456 128 1000 256

# 3. serve under load (VERDICT #7): coalesce window sweep at 1M docs
run python scripts/perf/serve_load.py --mode search --n-docs 1000000 --concurrency 32 --duration 30 --coalesce-ms 2
run python scripts/perf/serve_load.py --mode search --n-docs 1000000 --concurrency 32 --duration 30 --coalesce-ms 10
run python scripts/perf/serve_load.py --mode search --n-docs 1000000 --concurrency 32 --duration 30 --coalesce-ms 30
run python scripts/perf/serve_load.py --mode rerank --concurrency 16 --duration 30 --max-batch 128

# 4. CLI-chain e2e on hardware (VERDICT #8)
RUN_TIMEOUT=3600
run python scripts/perf/pipeline_e2e.py --n-docs 100000 --n-queries 512
