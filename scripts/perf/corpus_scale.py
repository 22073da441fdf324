"""8.8M-doc exact top-k on ONE chip (BASELINE.md corpus-scale target).

Builds an MS-MARCO-sized random corpus (8,841,823 x 768 bf16 = 13.5 GB)
directly in HBM via donated chunked writes (never 2x resident), runs the
score-free Pallas path (pallas_hier2_rescore: gmax-only kernel + max-
pyramid selection + fp32 candidate rescore), times it, and audits
exactness against an independent chunked jnp.dot + lax.top_k pass on a
query sample.

    python scripts/perf/corpus_scale.py [N] [Q] [K]
"""

import sys
import time
from functools import partial

import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_841_823
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    D = 768
    AUDIT_Q = 4

    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from openmatch_tpu.ops.pallas_mips import pallas_block_topk

    chunk = 1_105_228  # 8 chunks cover 8,841,823
    n_chunks = -(-N // chunk)
    Np = n_chunks * chunk

    @partial(jax.jit, donate_argnums=(0,))
    def fill(buf, key, start):
        block = jax.random.normal(key, (chunk, D), jnp.bfloat16)
        return jax.lax.dynamic_update_slice(buf, block, (start, 0))

    t0 = time.time()
    corpus = jnp.zeros((Np, D), jnp.bfloat16)
    keys = jax.random.split(jax.random.PRNGKey(0), n_chunks)
    for i in range(n_chunks):
        corpus = fill(corpus, keys[i], i * chunk)
    corpus = corpus[:N]
    np.asarray(corpus.ravel()[0:1])
    print(f"corpus [{N}, {D}] bf16 built in {time.time() - t0:.0f}s", flush=True)

    queries = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.bfloat16)

    def run():
        return pallas_block_topk(queries, corpus, k=K)

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

    # exactness audit: independent chunked scoring for a query sample
    qa = queries[:AUDIT_Q]

    @jax.jit
    def audit_scores(qa, corpus):
        def body(carry, c_block):
            return carry, jnp.dot(qa, c_block.T, preferred_element_type=jnp.float32)

        blocks = corpus[: (N // chunk) * chunk].reshape(-1, chunk, D)
        _, out = jax.lax.scan(body, 0, blocks)  # [blocks, AQ, chunk]
        out = jnp.transpose(out, (1, 0, 2)).reshape(qa.shape[0], -1)
        tail = jnp.dot(qa, corpus[(N // chunk) * chunk:].T,
                       preferred_element_type=jnp.float32)
        return jnp.concatenate([out, tail], axis=1)

    ref_scores = audit_scores(qa, corpus)  # [AUDIT_Q, N] f32 on device
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
