"""Microbenchmarks for the exact-MIPS pipeline pieces on the real chip.

Usage: python scripts/perf/micro.py MODE [Q] [N] [K]

One mode per process (big graphs compile slowly over the remote-compile
tunnel; the persistent cache makes re-runs cheap). Timing uses an on-device
fori_loop with a value-dependence chain between iterations, so the ~27 ms
per-dispatch tunnel overhead is amortized and XLA cannot hoist the body.
"""

import sys
import time

import numpy as np


def main():
    mode = sys.argv[1]
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
    D = 768
    ITERS = 10

    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    corpus = jnp.asarray(rng.randn(N, D).astype(np.float32), jnp.bfloat16)
    queries = jnp.asarray(rng.randn(Q, D).astype(np.float32), jnp.bfloat16)

    def pad_to(c, tile):
        """Raw fused_* kernels require N % tile == 0 (wrappers pad)."""
        pad = (-c.shape[0]) % tile
        return jnp.pad(c, ((0, pad), (0, 0))) if pad else c

    def body_of(fn):
        """fn(q, corpus) -> array; returns a jitted ITERS-iteration loop."""

        def loop(q, c):
            def body(i, carry):
                out = fn(q + carry, c)
                return carry + out.ravel()[0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

            return jax.lax.fori_loop(0, ITERS, body, jnp.bfloat16(0.0))

        return jax.jit(loop)

    if mode == "matmul_f32":
        fn = lambda q, c: jnp.dot(q, c.T, preferred_element_type=jnp.float32)
    elif mode == "matmul_bf16":
        fn = lambda q, c: jnp.dot(q, c.T, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    elif mode == "gmax_xla":
        def fn(q, c):
            s = jnp.dot(q, c.T, preferred_element_type=jnp.float32)
            return s.reshape(Q, N // 8, 8).max(axis=-1)
    elif mode == "gmax_pallas":
        from openmatch_tpu.ops.pallas_mips import fused_gmax_only

        corpus = pad_to(corpus, 2048)
        fn = lambda q, c: fused_gmax_only(q, c, tile=2048)
    elif mode.startswith("gmax_pallas_t"):
        from openmatch_tpu.ops.pallas_mips import fused_gmax_only

        tile = int(mode.split("t")[-1])
        corpus = pad_to(corpus, tile)
        fn = lambda q, c: fused_gmax_only(q, c, tile=tile)
    elif mode.startswith("gp_"):  # gp_<tile>_<tile_q>: gmax-only sweep
        from openmatch_tpu.ops.pallas_mips import fused_gmax_only

        _, t, tq = mode.split("_")
        corpus = pad_to(corpus, int(t))
        fn = lambda q, c: fused_gmax_only(q, c, tile=int(t), tile_q=int(tq))
    elif mode.startswith("sgp_"):  # sgp_<tile>_<tile_q>: score+gmax sweep
        from openmatch_tpu.ops.pallas_mips import fused_score_gmax

        _, t, tq = mode.split("_")
        corpus = pad_to(corpus, int(t))
        fn = lambda q, c: fused_score_gmax(q, c, tile=int(t), tile_q=int(tq))[1]
    elif mode.startswith("pallas_full_"):  # pallas_full_<tile>_<tile_q>
        from openmatch_tpu.ops.pallas_mips import pallas_hier2_search

        _, _, t, tq = mode.split("_")
        fn = lambda q, c: pallas_hier2_search(q, c, k=K, tile=int(t), tile_q=int(tq))[0]
    elif mode.startswith("rescore_full_"):  # rescore_full_<tile>_<tile_q>
        from openmatch_tpu.ops.pallas_mips import pallas_hier2_rescore

        _, _, t, tq = mode.split("_")
        fn = lambda q, c: pallas_hier2_rescore(q, c, k=K, tile=int(t), tile_q=int(tq))[0]
    elif mode == "score_gmax_pallas":
        from openmatch_tpu.ops.pallas_mips import fused_score_gmax

        fn = lambda q, c: fused_score_gmax(q, c, tile=2048)[1]
    elif mode.startswith("topk_"):
        W = int(mode.split("_")[1])
        g = jnp.asarray(rng.randn(Q, W).astype(np.float32))

        def fn(q, c):
            return jax.lax.top_k(g + q[0, 0].astype(jnp.float32), K)[0]
    elif mode.startswith("sortval_"):
        W = int(mode.split("_")[1])
        g = jnp.asarray(rng.randn(Q, W).astype(np.float32))

        def fn(q, c):
            return jnp.sort(g + q[0, 0].astype(jnp.float32), axis=-1)
    elif mode.startswith("sortpair_"):  # variadic sort w/ id payload [Q, W]
        W = int(mode.split("_")[1])
        g = jnp.asarray(rng.randn(Q, W).astype(np.float32))
        ids = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), (Q, W))

        def fn(q, c):
            neg_s, out_i = jax.lax.sort(
                (jnp.negative(g + q[0, 0].astype(jnp.float32)), ids),
                dimension=1, num_keys=1)
            return neg_s[:, :K]
    elif mode.startswith("topkgather_"):  # top_k + posterior id gather [Q, W]
        W = int(mode.split("_")[1])
        g = jnp.asarray(rng.randn(Q, W).astype(np.float32))
        ids = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), (Q, W))

        def fn(q, c):
            s, pos = jax.lax.top_k(g + q[0, 0].astype(jnp.float32), K)
            return jnp.take_along_axis(ids, pos, axis=1) + s[:, :1].astype(jnp.int32)
    elif mode.startswith("approxk_"):
        W = int(mode.split("_")[1])
        g = jnp.asarray(rng.randn(Q, W).astype(np.float32))

        def fn(q, c):
            return jax.lax.approx_max_k(g + q[0, 0].astype(jnp.float32), K)[0]
    elif mode.startswith("gather_minor_"):  # take_along_axis cols from [Q, W]
        W = int(mode.split("_")[-1])
        corpus = jnp.asarray(rng.randn(Q, W).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, W, size=(Q, 8000)), jnp.int32)

        def fn(q, c):
            return jnp.take_along_axis(c + q[0, 0].astype(jnp.float32), idx, axis=1)
    elif mode.startswith("slab_gather_"):  # [Q,k,1] gather of 8-col slabs
        W = int(mode.split("_")[-1])
        # pass the source as the loop ARG (a closed-over array this big
        # would be serialized into the program upload by the tunnel)
        corpus = jnp.asarray(rng.randn(Q, W).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, W // 8, size=(Q, K)), jnp.int32)

        def fn(q, c):
            s3 = (c + q[0, 0].astype(jnp.float32)).reshape(Q, W // 8, 8)
            return jnp.take_along_axis(s3, idx[:, :, None], axis=1)
    elif mode == "gather_rows":  # corpus-row gather (rescore phase C shape)
        QB = 32
        idx = jnp.asarray(rng.randint(0, N, size=(Q, 8000)), jnp.int32)

        def fn(q, c):
            def block(args):
                ib, qb = args
                rows = jnp.take(c, ib.reshape(-1), axis=0).reshape(QB, 8000, D)
                return jnp.einsum("qcd,qd->qc", rows, qb,
                                  preferred_element_type=jnp.float32)

            return jax.lax.map(block, (idx.reshape(-1, QB, 8000),
                                       q.reshape(-1, QB, D)))
    elif mode == "select_groups":  # pyramid selection alone on [Q, N/8]
        from openmatch_tpu.ops.mips import _select_groups

        g = jnp.asarray(rng.randn(Q, N // 8).astype(np.float32))

        def fn(q, c):
            return _select_groups(g + q[0, 0].astype(jnp.float32), K)
    elif mode.startswith("block_full"):  # block_full[_tileg_tileq]
        from openmatch_tpu.ops.pallas_mips import pallas_block_topk

        parts = mode.split("_")
        tg = int(parts[2]) if len(parts) > 2 else 256
        tq = int(parts[3]) if len(parts) > 3 else 512
        fn = lambda q, c: pallas_block_topk(q, c, k=K, tile_g=tg, tile_q=tq)[0]
    elif mode.startswith("block_gmax"):  # block_gmax[_tileg_tileq]
        from openmatch_tpu.ops.pallas_mips import fused_block_gmax

        parts = mode.split("_")
        tg = int(parts[2]) if len(parts) > 2 else 256
        tq = int(parts[3]) if len(parts) > 3 else 512
        NB = N // 8
        NBp = -(-NB // tg) * tg
        cb = jnp.pad(corpus[: NB * 8].reshape(NB, 8 * D), ((0, NBp - NB), (0, 0)))

        def fn(q, c):
            return fused_block_gmax(q, cb, tile_g=tg, tile_q=tq)
    elif mode == "scores_kernel":  # doc-major score store alone
        from openmatch_tpu.ops.pallas_mips import fused_scores

        Np = -(-N // 2048) * 2048
        cp = pad_to(corpus, 2048)
        corpus = jnp.zeros((8, D), jnp.bfloat16)

        def fn(q, c):
            return fused_scores(q, cp, tile=2048)
    elif mode == "score_full":  # score-materializing block path, prepared
        from openmatch_tpu.ops.pallas_mips import (
            pallas_block_score_topk_prepared, prepare_block_corpus)

        prep = prepare_block_corpus(corpus, with_plain=True)
        corpus = jnp.zeros((8, D), jnp.bfloat16)  # free the original

        def fn(q, c):
            return pallas_block_score_topk_prepared(q, prep, k=K)[0]
    elif mode == "block_prep_full":  # score-free block path, prepared
        from openmatch_tpu.ops.pallas_mips import (
            pallas_block_topk_prepared, prepare_block_corpus)

        prep = prepare_block_corpus(corpus, with_plain=False)
        corpus = jnp.zeros((8, D), jnp.bfloat16)

        def fn(q, c):
            return pallas_block_topk_prepared(q, prep, k=K)[0]
    elif mode == "cand_slices":  # [Q,k] 8-wide slice gather + final topk
        import jax.random as jr
        from openmatch_tpu.ops.mips import gather_row_slices

        scores = jr.normal(jr.PRNGKey(0), (Q, N), jnp.float32)
        bid = jr.randint(jr.PRNGKey(1), (Q, K), 0, N // 8)
        corpus = jnp.zeros((8, D), jnp.bfloat16)

        def fn(q, c):
            cand = gather_row_slices(
                scores + q[0, 0].astype(jnp.float32), bid * 8, 8
            ).reshape(Q, K * 8)
            return jax.lax.top_k(cand, K)[0]
    elif mode == "hier2_full":
        from openmatch_tpu.ops.mips import exact_search

        fn = lambda q, c: exact_search(q, c, k=K, chunk_size=0, method="hier2")[0]
    elif mode == "xla_full_pyramid":
        from openmatch_tpu.ops.mips import exact_search

        fn = lambda q, c: exact_search(q, c, k=K, chunk_size=0, method="pyramid")[0]
    elif mode == "rescore_full":
        from openmatch_tpu.ops.pallas_mips import pallas_hier2_rescore

        fn = lambda q, c: pallas_hier2_rescore(q, c, k=K)[0]
    else:
        raise SystemExit(f"unknown mode {mode}")

    loop = body_of(fn)
    t0 = time.time()
    r = loop(queries, corpus)
    np.asarray(r)
    t_compile = time.time() - t0
    t0 = time.time()
    r = loop(queries, corpus)
    np.asarray(r)
    dt = (time.time() - t0) / ITERS
    print(
        f"{mode}: Q={Q} N={N} K={K}: {dt * 1000:.2f} ms/iter "
        f"({Q / dt:,.0f} QPS) [first call {t_compile:.0f}s]",
        flush=True,
    )


if __name__ == "__main__":
    main()
