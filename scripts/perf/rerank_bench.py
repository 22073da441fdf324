"""Cross-encoder reranking throughput on the real chip (VERDICT r2 #6).

The reranker is the workload behind half the reference's published tables
(/root/reference/v1/README.md:162-176: BERT-base / ELECTRA-base MS MARCO
rerank recipes; monoT5 via the v2 RRModel T5 path). This measures
pairs/s/chip for the two RRModel backbones at the recipe pair length
(q_max_len 32 + p_max_len 128 + 2 separators = 162 -> padded 192):

    python scripts/perf/rerank_bench.py bert|monot5 [BATCH] [SEQ_LEN]

One model per process (clean HBM, one tunnel compile). Weights are
random-initialized at the published geometry — throughput depends on
shapes, not values. Scores follow the serving path: RRModel.score ->
relevance_logprob. Queries/s at reranking depth d = pairs_per_s / d.
"""

import sys
import time

import numpy as np


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "bert"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    ITERS = 16

    sys.path.insert(0, "/root/repo")
    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from openmatch_tpu.models.rr_model import RRModel

    if kind == "bert":
        from openmatch_tpu.models.bert import BertConfig

        model = RRModel(encoder_config=BertConfig(add_pooler=False),
                        head_in_dim=768, dtype=jnp.bfloat16)
    elif kind == "monot5":
        from openmatch_tpu.models.t5 import T5Config

        model = RRModel(encoder_config=T5Config(), backbone_type="t5",
                        pos_token_id=1176, neg_token_id=6136,
                        dtype=jnp.bfloat16)
    else:
        raise SystemExit(f"unknown model kind {kind}")

    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, 30000, size=(B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    segs = jnp.zeros((B, S), jnp.int32)

    @jax.jit
    def loop(params, ids, mask, segs):
        def body(i, carry):
            s = model.score(params, ids + carry, mask, segs)
            lp = model.relevance_logprob(s)
            return carry + (lp[0] * 1e-30).astype(jnp.int32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    np.asarray(loop(params, ids, mask, segs))  # compile + warm
    t0 = time.time()
    np.asarray(loop(params, ids, mask, segs))
    dt = (time.time() - t0) / ITERS
    pps = B / dt
    print(f"{kind}: {dt * 1e3:.1f} ms/batch of {B} pairs @S={S} -> "
          f"{pps:,.0f} pairs/s/chip "
          f"(depth 100: {pps / 100:,.1f} q/s; depth 1000: {pps / 1000:,.2f} q/s)",
          flush=True)


if __name__ == "__main__":
    main()


