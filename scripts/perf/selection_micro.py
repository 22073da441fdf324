"""Profile the selection primitives at the SERVING query count.

The _plan_pyramid cost constants were fit at Q=512 (ops/mips.py
_topk_ms/_gather_ms); the query-split serving shape runs Q=128 per chip,
where fixed overheads weigh differently and the plan choice shifts. This
measures, loop-amortized on the real chip:

    python scripts/perf/selection_micro.py topk  W [Q K]   lax.top_k on [Q, W]
    python scripts/perf/selection_micro.py gather W [Q K]  gather_row_slices
                                                 [Q, K] slabs of 8 from [Q, W]
    python scripts/perf/selection_micro.py idfix W [Q K]   [Q, K] take_along_axis

One primitive+width per process (clean compiles over the tunnel).
"""

import sys
import time

import numpy as np


def main():
    prim = sys.argv[1]
    W = int(sys.argv[2])
    Q = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
    # gather only: slab width (the expansion fanout f — descriptor count
    # is [Q, K] regardless, but bigger slabs lower differently)
    F = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    ITERS = 32

    sys.path.insert(0, "/root/repo")
    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    W = -(-W // F) * F  # gather contract: W % slab == 0
    x = jr.normal(jr.PRNGKey(0), (Q, W), jnp.float32)
    idx = jr.randint(jr.PRNGKey(1), (Q, K), 0, max(W // F, 1), jnp.int32)

    if prim == "topk":
        def body_fn(v):
            s, _ = jax.lax.top_k(v, min(K, W))
            return s[0, 0]
    elif prim == "gather":
        from openmatch_tpu.ops.mips import gather_row_slices

        def body_fn(v):
            g = gather_row_slices(v, idx * F, F)
            return g[0, 0, 0]
    elif prim == "idfix":
        def body_fn(v):
            g = jnp.take_along_axis(v[:, :K], idx % K, axis=1)
            return g[0, 0]
    else:
        raise SystemExit(f"unknown primitive {prim}")

    @jax.jit
    def loop(x):
        def body(i, carry):
            return carry + body_fn(x + carry) * 1e-30

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    np.asarray(loop(x))
    t0 = time.time()
    np.asarray(loop(x))
    dt = (time.time() - t0) / ITERS
    f_note = f" F={F}" if prim == "gather" else ""
    print(f"{prim} W={W} Q={Q} K={K}{f_note}: {dt * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
