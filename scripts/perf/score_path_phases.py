"""Time one phase of the score-materializing block path in isolation.

One phase per process (clean HBM, small compiles over the remote tunnel):

    python scripts/perf/score_path_phases.py PHASE [N] [Q] [K]

PHASE:
  a1    fused_block_gmax over the block-row corpus
  a2    fused_scores doc-major score store over the plain corpus
  sel   _select_groups max-pyramid over synthetic gmax [Q, N/8]
  cand  gather_row_slices candidate fetch + final top_k over synthetic
        scores [Q, N] (the phase-C shape)
  a3/a3l1    plain-corpus gmax kernel (production phase A), loop-amortized
  sel/sell1  selection with/without precomputed level 1
  resc/resc0 DMA gather-rescore, pipelined/drain
  plain      whole production path; argv[5] = storage segment count
  rescseg    segmented-corpus rescore in isolation; argv[5] = segments
  a3seg      per-segment gmax kernels + concat; argv[5] = segments
"""

import sys
import time

import numpy as np


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    for leaf in (out if isinstance(out, tuple) else (out,)):
        np.asarray(leaf.ravel()[0:1])
    del out
    t0 = time.time()
    out = None
    for _ in range(reps):
        del out  # free before the next alloc: avoid 2x transients
        out = fn(*args)
    for leaf in (out if isinstance(out, tuple) else (out,)):
        np.asarray(leaf.ravel()[0:1])
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt * 1000:.1f} ms", flush=True)
    return out


def main():
    phase = sys.argv[1]
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2_210_456
    Q = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
    # sel only: force a finest-first fanout plan, e.g. "8,8" (default:
    # whatever _plan_pyramid picks — label says which)
    plan = tuple(int(f) for f in sys.argv[5].split(",")) \
        if len(sys.argv) > 5 else None
    D = 768
    GROUP = 8

    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from openmatch_tpu.ops.pallas_mips import split_tiles

    NB = N // GROUP
    NBp = -(-NB // 256) * 256

    if phase == "a1":
        from openmatch_tpu.ops.pallas_mips import fused_block_gmax

        cb = jr.normal(jr.PRNGKey(0), (NBp, GROUP * D), jnp.bfloat16)
        q = jr.normal(jr.PRNGKey(1), (Q, D), jnp.bfloat16)
        timed("a1 fused_block_gmax", lambda: fused_block_gmax(q, cb))
    elif phase == "a2":
        from openmatch_tpu.ops.pallas_mips import fused_scores

        plain = jr.normal(jr.PRNGKey(0), (NBp * GROUP, D), jnp.bfloat16)
        q = jr.normal(jr.PRNGKey(1), (Q, D), jnp.bfloat16)
        timed("a2 fused_scores", lambda: fused_scores(q, plain, tile=2048))
    elif phase in ("a3", "a3l1"):
        # plain-corpus gmax kernel (the production phase A), loop-
        # amortized; a3l1 = with fused level-1 emission + in-kernel
        # pad masking (emit_l1=8, nb_valid set)
        from openmatch_tpu.ops.pallas_mips import fused_plain_gmax

        plain = jr.normal(jr.PRNGKey(0), (NBp * GROUP, D), jnp.bfloat16)
        q = jr.normal(jr.PRNGKey(1), (Q, D), jnp.bfloat16)
        emit = 8 if phase == "a3l1" else 0
        nbv = NB if phase == "a3l1" else None
        iters = 8

        @jax.jit
        def loop(q, plain):
            def body(i, carry):
                out = fused_plain_gmax(q + carry, plain, emit_l1=emit,
                                       nb_valid=nbv)
                g = out[0] if emit else out
                return carry + g[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

            return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0.0))

        np.asarray(loop(q, plain))
        t0 = time.time()
        np.asarray(loop(q, plain))
        dt = (time.time() - t0) / iters
        print(f"{phase} fused_plain_gmax(emit_l1={emit}): {dt * 1000:.1f} ms",
              flush=True)
    elif phase in ("a3base", "a3notr", "a3mxutr", "a3nomax"):
        # per-step cost decomposition of the gmax kernel (r4 roofline:
        # the stream runs at 45% of HBM peak; which VPU op is the tax?).
        # Self-contained experimental kernels — the production kernel in
        # pallas_mips is untouched.
        #   a3base  = production shape: dot + stride-8 max + transpose
        #   a3notr  = same minus the in-kernel transpose (doc-major out)
        #   a3mxutr = transpose via MXU dot_general against an identity
        #   a3nomax = dot + transpose only (no stride-8 member max)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from openmatch_tpu.ops.pallas_mips import _interpret_mode

        tile_g, tile_q = 256, 128

        def make_kernel(variant):
            def kernel(q_ref, c_ref, g_ref, s_scratch):
                st = jax.lax.dot_general(
                    c_ref[:], q_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [tile_g*8, tq] f32, docs on sublanes
                s_scratch[:] = st
                if variant == "a3nomax":
                    g = s_scratch[0::GROUP, :]
                else:
                    g = s_scratch[0::GROUP, :]
                    for m in range(1, GROUP):
                        g = jnp.maximum(g, s_scratch[m::GROUP, :])
                if variant == "a3notr":
                    g_ref[:] = g  # doc-major store, no transpose
                elif variant == "a3mxutr":
                    # transpose on the MXU: contract g's sublane dim with
                    # an identity -> [tq, tile_g], no VPU shuffle network
                    eye = (jax.lax.broadcasted_iota(jnp.int32, (tile_g, tile_g), 0)
                           == jax.lax.broadcasted_iota(jnp.int32, (tile_g, tile_g), 1))
                    g_ref[:] = jax.lax.dot_general(
                        g, eye.astype(jnp.float32),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    g_ref[:] = jnp.swapaxes(g, 0, 1)

            return kernel

        doc_major = phase == "a3notr"
        out_shape = ((NBp, Q) if doc_major else (Q, NBp))
        out_spec = (pl.BlockSpec((tile_g, tile_q), lambda qb, t: (t, qb),
                                 memory_space=pltpu.VMEM) if doc_major else
                    pl.BlockSpec((tile_q, tile_g), lambda qb, t: (qb, t),
                                 memory_space=pltpu.VMEM))

        @jax.jit
        def gmax_x(queries, plain):
            return pl.pallas_call(
                make_kernel(phase),
                grid=(Q // tile_q, NBp // tile_g),
                in_specs=[
                    pl.BlockSpec((tile_q, D), lambda qb, t: (qb, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_g * GROUP, D), lambda qb, t: (t, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                scratch_shapes=[pltpu.VMEM((tile_g * GROUP, tile_q), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary")),
                interpret=_interpret_mode(),
            )(queries, plain)

        plain = jr.normal(jr.PRNGKey(0), (NBp * GROUP, D), jnp.bfloat16)
        q = jr.normal(jr.PRNGKey(1), (Q, D), jnp.bfloat16)
        iters = 8

        @jax.jit
        def loop(q, plain):
            def body(i, carry):
                g = gmax_x(q + carry, plain)
                return carry + g[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

            return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0.0))

        np.asarray(loop(q, plain))
        t0 = time.time()
        np.asarray(loop(q, plain))
        dt = (time.time() - t0) / iters
        stream_gb = NBp * GROUP * D * 2 / 1e9
        print(f"{phase}: {dt * 1000:.1f} ms, stream {stream_gb / dt:.0f} GB/s "
              f"({stream_gb / dt / 819 * 100:.0f}% of peak)", flush=True)
    elif phase == "a3tile":
        # roofline probe for the gmax corpus stream (VERDICT r4 #6):
        # argv[5] = tile_g (corpus blocks per grid step; default 256).
        # Prints ms AND achieved corpus-stream GB/s vs the ~819 GB/s v5e
        # HBM peak. Combine with OPENMATCH_GMAX_PARALLEL=1 (process
        # start) to probe "parallel" grid semantics.
        from openmatch_tpu.ops.pallas_mips import fused_plain_gmax

        tile_g = int(sys.argv[5]) if len(sys.argv) > 5 else 256
        plain = jr.normal(jr.PRNGKey(0), (NBp * GROUP, D), jnp.bfloat16)
        q = jr.normal(jr.PRNGKey(1), (Q, D), jnp.bfloat16)
        iters = 8

        @jax.jit
        def loop(q, plain):
            def body(i, carry):
                g, _ = fused_plain_gmax(q + carry, plain, tile_g=tile_g,
                                        emit_l1=8, nb_valid=NB)
                return carry + g[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

            return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0.0))

        np.asarray(loop(q, plain))
        t0 = time.time()
        np.asarray(loop(q, plain))
        dt = (time.time() - t0) / iters
        stream_gb = NBp * GROUP * D * 2 / 1e9
        print(f"a3tile tile_g={tile_g}: {dt * 1000:.1f} ms, "
              f"corpus stream {stream_gb / dt:.0f} GB/s "
              f"({stream_gb / dt / 819 * 100:.0f}% of v5e HBM peak)",
              flush=True)
    elif phase in ("sel", "sell1"):
        # loop-amortized (27 ms/dispatch would swamp a ~6 ms phase);
        # sell1 = selection fed a PRECOMPUTED level-1 (what the fused
        # emit_l1 kernel hands it — skips the widest reshape-max here)
        from openmatch_tpu.ops.mips import _plan_pyramid, _select_groups

        g = jr.normal(jr.PRNGKey(0), (Q, NBp), jnp.float32)
        iters = 16
        if plan is None:
            plan = _plan_pyramid(NBp, K, Q)
        with_l1 = phase == "sell1"
        l1_in = (g.reshape(Q, NBp // plan[0], plan[0]).max(-1)
                 if with_l1 else None)

        @jax.jit
        def loop(g, l1_in):
            def body(i, carry):
                ids = _select_groups(g + carry, K, fanout=plan, l1=l1_in)
                return carry + (ids[0, 0] % 2).astype(jnp.float32) * 1e-30

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        np.asarray(loop(g, l1_in))
        t0 = time.time()
        np.asarray(loop(g, l1_in))
        print(f"{phase} _select_groups plan={plan}: "
              f"{(time.time() - t0) / iters * 1000:.1f} ms", flush=True)
    elif phase == "cand":
        from openmatch_tpu.ops.mips import gather_row_slices

        scores = jr.normal(jr.PRNGKey(0), (Q, NBp * GROUP), jnp.float32)
        bid = jr.randint(jr.PRNGKey(1), (Q, K), 0, NB, jnp.int32)

        @jax.jit
        def cand_rank(scores, bid):
            cand = gather_row_slices(scores, bid * GROUP, GROUP).reshape(Q, K * GROUP)
            ids = (bid[:, :, None] * GROUP
                   + jnp.arange(GROUP, dtype=jnp.int32)).reshape(Q, K * GROUP)
            s, pos = jax.lax.top_k(cand, K)
            return s, jnp.take_along_axis(ids, pos, axis=1)

        timed("cand gather+rank", cand_rank, scores, bid)
    elif phase in ("resc", "resc0"):
        # DMA gather-rescore kernel in isolation, amortized in one
        # on-device loop (the 27 ms dispatch would swamp a ~5 ms phase);
        # resc = software-pipelined kernel, resc0 = drain-then-compute
        from openmatch_tpu.ops.pallas_mips import pallas_gather_rescore

        plain = jr.normal(jr.PRNGKey(0), (NBp * GROUP, D), jnp.bfloat16)
        q = jr.normal(jr.PRNGKey(1), (Q, D), jnp.bfloat16)
        bid = jr.randint(jr.PRNGKey(2), (Q, K), 0, NB, jnp.int32)
        pipe = phase == "resc"
        kt = plan[0] if plan else 64  # argv[5] = kt sweep (kt*8 % 128 == 0)
        iters = 16

        @jax.jit
        def loop(q, plain, bid):
            def body(i, carry):
                out, _ = pallas_gather_rescore(q + carry, plain, bid,
                                               pipeline=pipe, kt=kt)
                return carry + out[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

            return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0.0))

        np.asarray(loop(q, plain, bid))
        t0 = time.time()
        np.asarray(loop(q, plain, bid))
        dt = (time.time() - t0) / iters
        print(f"{phase} gather_rescore(pipeline={pipe}, kt={kt}): "
              f"{dt * 1000:.1f} ms", flush=True)
    elif phase == "plain":
        # whole-path rung: the production plain-kernel path end to end
        # (the exact_search_global shootout ran here once: 92.8 ms vs
        # 25.7 ms at 4.42M/Q=128 — deleted after losing 3.6x).
        # argv[5] (plan) doubles as SEGMENT COUNT here: "plain N Q K 8"
        # stores the corpus as 8 tile-aligned segment arrays, isolating
        # the segmented-storage overhead end to end (the 8.8M bench rung
        # showed ~1.2 ms per extra segment at 6.63M; this phase + rescseg
        # + a3seg decompose where it lands).
        from openmatch_tpu.ops.pallas_mips import (
            BlockCorpus, pallas_plain_topk_prepared)

        n_segs = plan[0] if plan else 1
        seg_tiles = split_tiles(NBp // 256, n_segs)
        segs, key = [], jr.PRNGKey(0)
        for nt in seg_tiles:
            key, sub = jr.split(key)
            segs.append(jr.normal(sub, (nt * 256 * GROUP, D), jnp.bfloat16))
        plain = tuple(segs) if n_segs > 1 else segs[0]
        q = jr.normal(jr.PRNGKey(1), (Q, D), jnp.bfloat16)
        iters = 8

        @jax.jit
        def loop(q, plain):
            p = BlockCorpus(cb=None, tail=segs[0][:0], n_docs=NBp * GROUP,
                            plain=plain)

            def body(i, carry):
                s, _ = pallas_plain_topk_prepared(q + carry, p, k=K)
                return carry + s[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

            return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0.0))

        np.asarray(loop(q, plain))
        t0 = time.time()
        np.asarray(loop(q, plain))
        print(f"{phase}: {(time.time() - t0) / iters * 1000:.1f} ms "
              f"(N={NBp * GROUP}, Q={Q}, K={K}, segs={n_segs})", flush=True)
    elif phase == "rescseg":
        # segmented-corpus DMA gather-rescore in isolation: argv[5] =
        # segment count. Distinguishes in-kernel routing cost (S @pl.when
        # guards per copy, scalar-core work linear in S) from the rest of
        # the segmented path.
        from openmatch_tpu.ops.pallas_mips import pallas_gather_rescore

        n_segs = plan[0] if plan else 8
        seg_tiles = split_tiles(NBp // 256, n_segs)
        segs, key = [], jr.PRNGKey(0)
        for nt in seg_tiles:
            key, sub = jr.split(key)
            segs.append(jr.normal(sub, (nt * 256 * GROUP, D), jnp.bfloat16))
        plain = tuple(segs) if n_segs > 1 else segs[0]
        q = jr.normal(jr.PRNGKey(1), (Q, D), jnp.bfloat16)
        bid = jr.randint(jr.PRNGKey(2), (Q, K), 0, NB, jnp.int32)
        iters = 16

        @jax.jit
        def loop(q, plain, bid):
            def body(i, carry):
                out, _ = pallas_gather_rescore(q + carry, plain, bid)
                return carry + out[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

            return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0.0))

        np.asarray(loop(q, plain, bid))
        t0 = time.time()
        np.asarray(loop(q, plain, bid))
        dt = (time.time() - t0) / iters
        print(f"rescseg gather_rescore(segs={n_segs}): {dt * 1000:.1f} ms",
              flush=True)
    elif phase == "a3seg":
        # per-segment gmax kernels + the XLA concat that the segmented
        # path pays before selection: argv[5] = segment count.
        from openmatch_tpu.ops.pallas_mips import fused_plain_gmax

        n_segs = plan[0] if plan else 8
        seg_tiles = split_tiles(NBp // 256, n_segs)
        segs, key = [], jr.PRNGKey(0)
        for nt in seg_tiles:
            key, sub = jr.split(key)
            segs.append(jr.normal(sub, (nt * 256 * GROUP, D), jnp.bfloat16))
        q = jr.normal(jr.PRNGKey(1), (Q, D), jnp.bfloat16)
        iters = 8

        @jax.jit
        def loop(q, segs):
            def body(i, carry):
                parts = [fused_plain_gmax(q + carry, s, emit_l1=8)
                         for s in segs]
                g = jnp.concatenate([p[0] for p in parts], axis=1)
                l1 = jnp.concatenate([p[1] for p in parts], axis=1)
                return carry + (g[0, 0] + l1[0, 0]).astype(jnp.bfloat16) \
                    * jnp.bfloat16(1e-30)

            return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0.0))

        np.asarray(loop(q, tuple(segs)))
        t0 = time.time()
        np.asarray(loop(q, tuple(segs)))
        dt = (time.time() - t0) / iters
        print(f"a3seg gmax+concat(segs={n_segs}): {dt * 1000:.1f} ms",
              flush=True)
    else:
        raise SystemExit(f"unknown phase {phase}")


if __name__ == "__main__":
    main()
