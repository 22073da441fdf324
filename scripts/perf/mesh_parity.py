"""Mesh-Searcher kernel-path parity: the VERDICT r2 #1 'done' check.

Times the compute path the mesh Searcher(partition="queries",
method="pallas") dispatches (_query_sharded_search_pallas_padded over a
1-device mesh) against the direct prepared-kernel path
(pallas_plain_topk_prepared) — both amortized in one on-device fori_loop
(the ~27 ms tunnel dispatch would otherwise hide a 5% difference).
Done = mesh path within ~5% of the direct path.

    python scripts/perf/mesh_parity.py [N] [Q] [K]
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
    from jax.sharding import Mesh

    from bench import build_block_corpus
    from openmatch_tpu.ops.mips import _query_sharded_search_pallas_padded
    from openmatch_tpu.ops.pallas_mips import (
        BlockCorpus, pallas_plain_topk_prepared)

    assert N % 8 == 0, "use an 8-multiple N so the padded plain array IS "\
        "the pad_plain layout the mesh path consumes"
    prep = build_block_corpus(jax, jnp, N)
    queries = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("data",))

    def timed(label, loop):
        # big arrays enter as ARGUMENTS (closed-over arrays would be
        # serialized into the remote-compile upload)
        np.asarray(loop(queries, prep.plain))
        t0 = time.time()
        np.asarray(loop(queries, prep.plain))
        dt = (time.time() - t0) / ITERS
        print(f"{label}: {dt * 1e3:.1f} ms/batch (Q={Q}, N={N})", flush=True)
        return dt

    @jax.jit
    def direct(qs, plain):
        p = BlockCorpus(cb=None, tail=prep.tail, n_docs=N, plain=plain)

        def body(i, carry):
            s, _ = pallas_plain_topk_prepared(qs + carry, p, k=K)
            return carry + s[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

        return jax.lax.fori_loop(0, ITERS, body, jnp.bfloat16(0.0))

    @jax.jit
    def mesh_loop(qs, plain):
        def body(i, carry):
            s, _ = _query_sharded_search_pallas_padded(
                qs + carry, plain, K, mesh, "data", N)
            return carry + s[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

        return jax.lax.fori_loop(0, ITERS, body, jnp.bfloat16(0.0))

    t_direct = timed("direct prepared kernel path", direct)
    with mesh:
        t_mesh = timed("mesh Searcher queries-partition path", mesh_loop)
    print(f"ratio mesh/direct = {t_mesh / t_direct:.3f} "
          f"({'OK <= 1.05' if t_mesh / t_direct <= 1.05 else 'ABOVE 5%'})",
          flush=True)


if __name__ == "__main__":
    main()
