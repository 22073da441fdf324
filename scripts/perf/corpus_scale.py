"""8.8M-doc exact top-k on ONE chip (BASELINE.md corpus-scale target).

Builds an MS-MARCO-sized random corpus DIRECTLY in the prepared PLAIN
doc-major layout ([N, 768] bf16 = 12.7 GiB) via donated chunked writes —
never 2x resident — runs the plain-only Pallas path
(pallas_plain_topk_prepared: strided-member gmax kernel + max-pyramid
selection + in-kernel DMA gather-rescore), times it with an on-device
fori_loop (the tunnel costs ~27 ms per dispatch), and audits exactness
against an independent chunked jnp.dot + lax.top_k pass on a query
sample.

    python scripts/perf/corpus_scale.py [N] [Q] [K]
"""

import sys
import time

import numpy as np

GROUP = 8


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_841_823
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    D = 768
    AUDIT_Q = 4
    ITERS = 8

    sys.path.insert(0, "/root/repo")
    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import build_block_corpus
    from openmatch_tpu.ops.pallas_mips import (
        BlockCorpus, pallas_plain_topk_prepared)

    t0 = time.time()
    prep = build_block_corpus(jax, jnp, N)
    print(f"plain corpus [{prep.plain.shape[0]}, {D}] bf16 ({N} docs) "
          f"built in {time.time() - t0:.0f}s", flush=True)

    queries = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.bfloat16)

    s, i = pallas_plain_topk_prepared(queries, prep, k=K)
    np.asarray(s.ravel()[0:1])

    @jax.jit
    def loop(qs, plain, tail_rows):
        p = BlockCorpus(cb=None, tail=tail_rows, n_docs=N, plain=plain)

        def body(_, carry):
            sl, _il = pallas_plain_topk_prepared(qs + carry, p, k=K)
            return carry + sl[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)

        return jax.lax.fori_loop(0, ITERS, body, jnp.bfloat16(0.0))

    np.asarray(loop(queries, prep.plain, prep.tail))
    t0 = time.time()
    np.asarray(loop(queries, prep.plain, prep.tail))
    dt = (time.time() - t0) / ITERS
    print(f"exact top-{K} @ {N} docs: {dt * 1000:.1f} ms/batch of {Q} "
          f"-> {Q / dt:,.0f} QPS on one chip", flush=True)

    # exactness audit: independent chunked scoring for a query sample
    qa = queries[:AUDIT_Q]
    NB = N // GROUP

    @jax.jit
    def audit_scores(qa, plain, tail_rows):
        ac = 16384  # doc rows per audit step
        n_steps = (NB * GROUP) // ac

        def body(carry, docs):
            return carry, jnp.dot(qa, docs.T, preferred_element_type=jnp.float32)

        blocks = plain[: n_steps * ac].reshape(n_steps, ac, D)
        _, out = jax.lax.scan(body, 0, blocks)  # [steps, AQ, ac]
        out = jnp.transpose(out, (1, 0, 2)).reshape(qa.shape[0], -1)
        rest = plain[n_steps * ac: NB * GROUP]
        rest_s = jnp.dot(qa, rest.T, preferred_element_type=jnp.float32)
        tail_s = jnp.dot(qa, tail_rows.T, preferred_element_type=jnp.float32)
        return jnp.concatenate([out, rest_s, tail_s], axis=1)

    ref_scores = audit_scores(qa, prep.plain, prep.tail)  # [AUDIT_Q, N] f32
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
