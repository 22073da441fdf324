"""8.8M-doc exact top-k on ONE chip (BASELINE.md corpus-scale target).

Builds an MS-MARCO-sized random corpus DIRECTLY in the block-row layout
(BlockCorpus: [N/8, 8*D] bf16 = 13.5 GB) via donated chunked writes —
never 2x resident, which prepare_block_corpus would need — runs the
score-free Pallas path (pallas_block_topk_prepared: block-gmax kernel +
max-pyramid selection + fp32 block rescore), times it, and audits
exactness against an independent chunked jnp.dot + lax.top_k pass on a
query sample.

    python scripts/perf/corpus_scale.py [N] [Q] [K]
"""

import sys
import time
from functools import partial

import numpy as np

GROUP = 8


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_841_823
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    D = 768
    AUDIT_Q = 4
    TILE_G = 256

    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from openmatch_tpu.ops.pallas_mips import (
        BlockCorpus, pallas_block_topk_prepared)

    NB = N // GROUP
    tail = N - NB * GROUP
    NBp = -(-NB // TILE_G) * TILE_G

    # block rows per fill step: the RNG transient (u32 bits + f32 normal +
    # bf16 block) rides on top of the 13.6 GB donated buffer, so keep each
    # step ~210 MB — 1.7 GB steps RESOURCE_EXHAUSTED a 16 GB v5e
    chunk = 17_269
    n_chunks = -(-NBp // chunk)

    @partial(jax.jit, donate_argnums=(0,), static_argnames=("rows",))
    def fill(buf, key, start, rows):
        block = jax.random.normal(key, (rows, GROUP * D), jnp.bfloat16)
        return jax.lax.dynamic_update_slice(buf, block, (start, 0))

    t0 = time.time()
    cb = jnp.zeros((NBp, GROUP * D), jnp.bfloat16)
    keys = jax.random.split(jax.random.PRNGKey(0), n_chunks)
    for i in range(n_chunks):
        rows = min(chunk, NB - i * chunk)  # pad rows stay zero
        if rows <= 0:
            break
        cb = fill(cb, keys[i], i * chunk, rows=rows)
    np.asarray(cb.ravel()[0:1])
    tail_rows = jax.random.normal(jax.random.PRNGKey(7), (tail, D), jnp.bfloat16)
    prep = BlockCorpus(cb=cb, tail=tail_rows, n_docs=N)
    print(f"block corpus [{NBp}, {GROUP * D}] bf16 ({N} docs) built in "
          f"{time.time() - t0:.0f}s", flush=True)

    queries = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.bfloat16)

    def run():
        return pallas_block_topk_prepared(queries, prep, k=K)

    t0 = time.time()
    s, i = run()
    np.asarray(s.ravel()[0:1])
    print(f"first call (compile) {time.time() - t0:.0f}s", flush=True)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        s, i = run()
    np.asarray(s.ravel()[0:1])
    dt = (time.time() - t0) / reps
    print(f"exact top-{K} @ {N} docs: {dt * 1000:.1f} ms/batch of {Q} "
          f"-> {Q / dt:,.0f} QPS on one chip", flush=True)

    # exactness audit: independent chunked scoring for a query sample,
    # reading the same block rows back as [rows*8, D] doc slices
    qa = queries[:AUDIT_Q]

    @jax.jit
    def audit_scores(qa, cb, tail_rows):
        ac = 2048  # block rows per audit step
        n_steps = NB // ac

        def body(carry, cb_step):
            docs = cb_step.reshape(-1, D)
            return carry, jnp.dot(qa, docs.T, preferred_element_type=jnp.float32)

        blocks = cb[: n_steps * ac].reshape(n_steps, ac, GROUP * D)
        _, out = jax.lax.scan(body, 0, blocks)  # [steps, AQ, ac*8]
        out = jnp.transpose(out, (1, 0, 2)).reshape(qa.shape[0], -1)
        rest = cb[n_steps * ac: NB].reshape(-1, D)  # block tail + ragged tail
        rest_s = jnp.dot(qa, rest.T, preferred_element_type=jnp.float32)
        tail_s = jnp.dot(qa, tail_rows.T, preferred_element_type=jnp.float32)
        return jnp.concatenate([out, rest_s, tail_s], axis=1)

    ref_scores = audit_scores(qa, cb, tail_rows)  # [AUDIT_Q, N] f32 on device
    ref_s, ref_i = jax.lax.top_k(ref_scores, K)
    got_s, got_i = np.asarray(s[:AUDIT_Q]), np.asarray(i[:AUDIT_Q])
    ref_s, ref_i = np.asarray(ref_s), np.asarray(ref_i)
    recalls = []
    for r in range(AUDIT_Q):
        recalls.append(len(set(got_i[r]) & set(ref_i[r])) / K)
    # scores agree to fp32 accumulation-order noise; sets agree modulo
    # equal-score boundary ties
    np.testing.assert_allclose(got_s, ref_s, rtol=1e-5, atol=1e-4)
    assert min(recalls) >= 0.999, recalls
    print(f"audit: recall vs independent top-k = {recalls}", flush=True)


if __name__ == "__main__":
    main()
