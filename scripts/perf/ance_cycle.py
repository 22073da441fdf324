"""One full ANCE refresh cycle on the real chip, every phase timed.

The reference's flagship long-running job (v1/retrievers/ANCE/drivers/
run_ann.py:180-216 + run_ann_data_gen.py:238-345) alternates train ->
encode corpus -> search -> mine hard negatives -> swap dataset. The
library path (ance.run_ance_alternating + retriever.Retriever +
ops.mips.Searcher) is CPU-tested (tests/test_ance.py); this script runs
ONE real cycle at ANCE-paper-like scale on the TPU and prints a
per-phase timing table for docs/performance.md:

    python scripts/perf/ance_cycle.py [N_DOCS] [N_QUERIES] [STEPS]

Defaults: 100k docs (seq 128), 1k queries (seq 32), 50 train steps per
generation, BERT-base bf16, batch 8x8 (the v2 recipe shape), encode
batch 512, topk_training=200 / negative_sample=20 (the reference's ANCE
defaults, run_ann_data_gen.py). Two generations: gen0 trains on random
negatives, the refresh mines hard negatives with the CURRENT params
through the real Retriever.encode_corpus/encode_queries/search path,
and gen1 trains on the published ann file — the per-step loss jump on
the swapped data is the "loss landscape changed" check.

One process = one TPU client (tunnel rule); all phases share it, which
is exactly the alternating mode's deployment shape.
"""

import json
import os
import sys
import time

import numpy as np

D_QL, D_PL = 32, 128
B, NP = 8, 8
ENCODE_BS = 512


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(argv[0]) if argv else 100_000
    n_queries = int(argv[1]) if len(argv) > 1 else 1_000
    steps = int(argv[2]) if len(argv) > 2 else 50

    sys.path.insert(0, "/root/repo")
    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if "--cpu" in sys.argv:  # smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from openmatch_tpu.ance.loop import (AnceConfig, build_ann_lines,
                                         generate_hard_negatives,
                                         run_ance_alternating, write_ann_data)
    from openmatch_tpu.config import (DataArguments, InferenceArguments,
                                      TrainingArguments)
    from openmatch_tpu.data.collators import pad_ids
    from openmatch_tpu.models.bert import BertConfig
    from openmatch_tpu.models.dr_model import DRModel
    from openmatch_tpu.retriever.retriever import Retriever
    from openmatch_tpu.train.dr_trainer import DRTrainer

    vocab = 30000
    if "--tiny" in sys.argv:
        cfg = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         add_pooler=False)
        vocab = 64
    else:
        cfg = BertConfig(add_pooler=False)

    model = DRModel(encoder_config=cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    args = TrainingArguments(per_device_train_batch_size=B, max_steps=10_000,
                             logging_steps=10_000)
    trainer = DRTrainer(model, params, args, total_steps=10_000)

    # deterministic synthetic token ids: doc i / query i are pure
    # functions of i, so the tokenized_* dicts, the train file, and the
    # encode streams all agree without holding two copies
    def doc_ids_(i):
        return np.random.RandomState(i).randint(
            1, vocab, size=D_PL).tolist()

    def query_ids_(i):
        return np.random.RandomState(10_000_000 + i).randint(
            1, vocab, size=D_QL).tolist()

    qrels = {f"q{i}": [f"d{i}"] for i in range(n_queries)}

    workdir = os.environ.get("ANCE_CYCLE_DIR", "/tmp/ance_cycle")
    os.makedirs(workdir, exist_ok=True)

    # gen0 train file: each query's positive + random negatives
    rng = np.random.RandomState(123)
    init_path = os.path.join(workdir, "gen_init.jsonl")
    with open(init_path, "w") as f:
        for i in range(n_queries):
            negs = rng.randint(0, n_docs, size=NP - 1)
            f.write(json.dumps({
                "query": query_ids_(i),
                "positives": [doc_ids_(i)],
                "negatives": [doc_ids_(int(j)) for j in negs],
            }) + "\n")

    losses = []  # (generation boundary markers ride on list length)

    def make_data_iter(path):
        rows = [json.loads(l) for l in open(path)]
        order = np.random.RandomState(len(losses)).permutation(len(rows))

        def gen():
            for lo in range(0, len(order) - B + 1, B):
                chunk = [rows[j] for j in order[lo:lo + B]]
                q = pad_ids([r["query"] for r in chunk], D_QL, 0)
                psgs = []
                for r in chunk:
                    psgs.append(r["positives"][0])
                    negs = (r["negatives"] * NP)[:NP - 1]
                    psgs.extend(negs)
                p = pad_ids(psgs, D_PL, 0)
                yield {
                    "query": {k: jnp.asarray(v) for k, v in q.items()},
                    "passage": {k: jnp.asarray(v) for k, v in p.items()},
                }

        return gen()

    phases = {}

    class TimedTrainer:
        """Counts steps/losses; run_ance_alternating drives the real one."""

        def __init__(self, tr):
            self._tr = tr

        @property
        def state(self):
            return self._tr.state

        def train_step(self, batch):
            loss = self._tr.train_step(batch)
            # keep the DEVICE value: float(loss) here would force a
            # ~27 ms tunnel readback per step, dominating train_gen_s
            # (the numbers go to docs/performance.md); converted after
            # the timed region
            losses.append(loss)
            return loss

    data_args = DataArguments(q_max_len=D_QL, p_max_len=D_PL)
    inf_args = InferenceArguments(per_device_eval_batch_size=ENCODE_BS)

    def refresh_fn(tr, generation):
        # sync the async train dispatches BEFORE starting the encode
        # clock, so waiting for the generation's last steps is charged to
        # train_gen_s, not encode_corpus_s
        np.asarray(jax.tree.leaves(tr.state.params)[0].ravel()[0:1])
        retriever = Retriever(model, tr.state.params, data_args, inf_args,
                              pad_token_id=0)
        t0 = time.time()
        retriever.encode_corpus(
            {"id": f"d{i}", "input_ids": doc_ids_(i)} for i in range(n_docs))
        phases["encode_corpus_s"] = time.time() - t0
        t0 = time.time()
        q_emb, qids = retriever.encode_queries(
            {"id": f"q{i}", "input_ids": query_ids_(i)}
            for i in range(n_queries))
        phases["encode_queries_s"] = time.time() - t0
        acfg = AnceConfig(ann_dir=os.path.join(workdir, "ann"),
                          topk_training=200, negative_sample=20)
        t0 = time.time()
        retrieved = retriever.search(q_emb, qids, topk=acfg.topk_training)
        phases["search_s"] = time.time() - t0
        t0 = time.time()
        negatives = generate_hard_negatives(retrieved, qrels, acfg, generation)
        tokenized_q = {f"q{i}": query_ids_(i) for i in range(n_queries)}
        needed = {d for negs in negatives.values() for d in negs}
        needed.update(p for ps in qrels.values() for p in ps)
        tokenized_c = {d: doc_ids_(int(d[1:])) for d in needed}
        path = write_ann_data(
            acfg.ann_dir, generation,
            build_ann_lines(negatives, qrels, tokenized_q, tokenized_c))
        phases["mine_and_publish_s"] = time.time() - t0
        return path

    t0 = time.time()
    wrapped = TimedTrainer(trainer)
    run_ance_alternating(wrapped, make_data_iter, refresh_fn, init_path,
                         steps_per_generation=steps, num_generations=2)
    # gen1 has no trailing refresh to sync it: force one readback so
    # total includes the last generation's actual execution
    np.asarray(jax.tree.leaves(trainer.state.params)[0].ravel()[0:1])
    total = time.time() - t0
    refresh = sum(phases.values())
    phases["train_gen_s"] = (total - refresh) / 2  # two generations

    losses = [float(x) for x in losses]
    g0, g1 = losses[:steps], losses[steps:]
    print(f"ance_cycle: n_docs={n_docs} n_queries={n_queries} "
          f"steps/gen={steps} B={B}x{NP} seq q{D_QL}/p{D_PL}", flush=True)
    for k in ("train_gen_s", "encode_corpus_s", "encode_queries_s",
              "search_s", "mine_and_publish_s"):
        print(f"  {k:>20}: {phases[k]:7.2f} s", flush=True)
    print(f"  {'cycle_total':>20}: {total:7.2f} s "
          f"({n_docs / phases['encode_corpus_s']:,.0f} docs/s encode)",
          flush=True)
    print(f"  loss gen0 first/last 10: {np.mean(g0[:10]):.4f} -> "
          f"{np.mean(g0[-10:]):.4f}; gen1 (mined negatives) first 10: "
          f"{np.mean(g1[:10]):.4f}", flush=True)


if __name__ == "__main__":
    main()
