"""Compare candidate-rescore strategies on the real chip.

Builds a random prepared corpus (block rows + plain doc-major) and times
the full block path under rescore="xla" (jnp.take row gather + einsum)
vs rescore="dma" (pallas_gather_rescore in-kernel async copies), plus the
plain-only path (single-layout; the production default). Timing uses an
on-device fori_loop (the tunnel costs ~27 ms per dispatch).

    python scripts/perf/rescore_compare.py [N] [Q] [K]

Measured 2026-08-17 on v5e at N=2.21M, Q=128, K=1000: xla 35.6 ms,
dma 19.7 ms, plain path 19.0-20.2 ms (and half the corpus HBM).
"""

import sys
import time

import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_210_456
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    D = 768
    ITERS = 8

    sys.path.insert(0, "/root/repo")
    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import build_block_corpus
    from openmatch_tpu.ops.pallas_mips import (
        BlockCorpus, pallas_block_topk_prepared, pallas_plain_topk_prepared)

    prep0 = build_block_corpus(jax, jnp, N)  # plain-only
    cb = jnp.reshape(prep0.plain, (-1, 8 * D))  # one-time relayout copy
    prep = BlockCorpus(cb=cb, tail=prep0.tail, n_docs=N, plain=prep0.plain)
    queries = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.bfloat16)

    def timed(label, call):
        @jax.jit
        def loop(qs, cb, tail_rows, plain):
            p = BlockCorpus(cb=cb, tail=tail_rows, n_docs=N, plain=plain)

            def body(_, carry):
                s, _i = call(qs + carry, p)
                return carry + s[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

            return jax.lax.fori_loop(0, ITERS, body, jnp.bfloat16(0.0))

        np.asarray(loop(queries, prep.cb, prep.tail, prep.plain))
        t0 = time.time()
        np.asarray(loop(queries, prep.cb, prep.tail, prep.plain))
        dt = (time.time() - t0) / ITERS
        print(f"{label}: {dt * 1e3:.1f} ms/batch (Q={Q}, N={N})", flush=True)

    timed("block path, rescore=xla",
          lambda qs, p: pallas_block_topk_prepared(qs, p, k=K, rescore="xla"))
    timed("block path, rescore=dma",
          lambda qs, p: pallas_block_topk_prepared(qs, p, k=K, rescore="dma"))
    timed("plain path, rescore drain (production default)",
          lambda qs, p: pallas_plain_topk_prepared(qs, p, k=K, pipeline=False))
    timed("plain path, rescore pipelined (measured a wash; off by default)",
          lambda qs, p: pallas_plain_topk_prepared(qs, p, k=K, pipeline=True))


if __name__ == "__main__":
    main()
