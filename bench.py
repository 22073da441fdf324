"""Headline benchmark: exact top-1k retrieval throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}

Baseline: BASELINE.json targets >=10k QPS exact top-1k over the 8.8M-doc
MS MARCO corpus on a v4-8 (4 chips). We benchmark the same computation
per-chip on a 1M-doc random corpus and scale the measured per-chip
doc-throughput to the 8.8M-doc/4-chip setting for ``vs_baseline``:
    projected_qps = qps_1M * (1M / 8.8M) * 4 chips
(ICI merge cost for 4 shards is a [Q, 4k] gather + top-k, negligible vs the
per-shard scan, so linear scaling is a fair projection.)
"""

import json
import time

import numpy as np


def main():
    import jax

    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from openmatch_tpu.ops.mips import exact_search

    N, D, Q, K = 1_000_000, 768, 512, 1000
    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:  # CPU fallback keeps the harness runnable anywhere
        N = 100_000

    rng = np.random.RandomState(0)
    corpus = jnp.asarray(rng.randn(N, D).astype(np.float32), jnp.bfloat16)
    queries = jnp.asarray(rng.randn(Q, D).astype(np.float32), jnp.bfloat16)

    def run():
        s, i = exact_search(queries, corpus, k=K, chunk_size=0, method="hier2")
        return s

    # warm (compile); block via host readback — device sync is unreliable
    # through the remote-tunnel platform
    np.asarray(run().ravel()[0:1])
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = run()
    np.asarray(out.ravel()[0:1])  # device executes in-order; waits for all
    dt = (time.time() - t0) / reps
    qps = Q / dt

    baseline_qps = 10_000.0  # BASELINE.json: v4-8, 8.8M docs
    projected = qps * (N / 8_800_000.0) * 4.0
    print(json.dumps({
        "metric": f"exact_top{K}_search_qps_{N // 1000}k_docs_1chip",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(projected / baseline_qps, 3),
    }))


if __name__ == "__main__":
    main()
