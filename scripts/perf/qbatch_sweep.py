"""Per-chip query-batch sweep for the replicated-index serving shape.

The gmax phase reads the whole corpus from HBM once per dispatched batch
(that read is its floor — ~1.4 GiB/Mdoc), so per-chip THROUGHPUT rises
with the per-chip query count until compute overtakes the corpus read:
selection + rescore scale linearly with Q, but the dominant corpus read
does not. This sweep measures t_slice at Q in {128, 256, ...} for one
corpus size and prints QPS/chip for each, to pick the throughput-optimal
serving batch (bench.py measures the latency-shaped Q=128 point).

HBM note: the [Q, NB] f32 gmax resident scales with Q — at 8.8M docs,
Q=256 adds ~0.53 GiB over Q=128, which together with the 12.65 GiB
corpus approaches the tunnel ceiling; sweep big-N rungs ascending in Q
and stop on the first failure (same discipline as bench.py).

    python scripts/perf/qbatch_sweep.py N_DOCS Q [Q ...]
        [--segs K]   corpus storage segments (default: bench.py's table)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (reuses build_block_corpus + ladder constants)


def time_slice_q(jax, jnp, n_docs, q_chip, iters=8, n_segs=1):
    """bench.time_slice with a parametric per-chip query count."""
    from functools import partial

    from openmatch_tpu.ops.pallas_mips import (BlockCorpus,
                                               pallas_plain_topk_prepared)

    prep = bench.build_block_corpus(jax, jnp, n_docs, n_segs=n_segs)
    queries = jax.random.normal(jax.random.PRNGKey(1), (q_chip, bench.D),
                                jnp.bfloat16)

    @jax.jit
    def loop(qs, plain, tail_rows):
        p = BlockCorpus(cb=None, tail=tail_rows, n_docs=n_docs, plain=plain)

        def body(i, carry):
            s, _ = pallas_plain_topk_prepared(qs + carry, p, k=bench.K)
            return carry + s[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

        return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0.0))

    np.asarray(loop(queries, prep.plain, prep.tail))
    t0 = time.time()
    r = loop(queries, prep.plain, prep.tail)
    np.asarray(r)
    return (time.time() - t0) / iters


def main():
    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    argv = list(sys.argv[1:])
    n_segs = None
    if "--segs" in argv:
        i = argv.index("--segs")
        n_segs = int(argv[i + 1])
        del argv[i:i + 2]
    n_docs = int(argv[0])
    qs = [int(a) for a in argv[1:]] or [128, 256]
    if n_segs is None:
        # proven-or-safest, never options[0] (the single-buffer build is
        # fragmentation-blocked at the full rung — fail-and-leak)
        n_segs = bench.default_segs(n_docs)

    for q in qs:
        t = time_slice_q(jax, jnp, n_docs, q, n_segs=n_segs)
        print(f"Q={q} N={n_docs}: t_slice={t * 1e3:.1f} ms -> "
              f"{q / t:,.0f} qps/chip", flush=True)


if __name__ == "__main__":
    main()
