"""Dump ranklib-format features from a v1 model for LeToR ensembling.

Reference: /root/reference/v1/gen_feature.py:10-49 — per (query, doc):
label, qid, the model's feature vector, its score, and the first-stage
retrieval score, in RankLib format. Feeds drivers/coor_ascent.py. The
reference's default model is bert (gen_feature.py:54) — its [CLS]
feature vector is what the BERT+Coor-Ascent MS MARCO document recipes
ensemble (v1/README.md:171-176).

    python -m openmatch_tpu.drivers.gen_feature \
        -model knrm -dev dev.jsonl -vocab vocab.txt \
        -checkpoint checkpoints/knrm -out features.txt
    python -m openmatch_tpu.drivers.gen_feature \
        -model bert [-maxp] -pretrain <hf-ckpt> -dev dev.jsonl \
        -checkpoint checkpoints/bert -out features.txt
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import batched
from ..train.state import TrainState, load_train_state, make_optimizer
from ..v1.dataset import V1Dataset
from .common import DictOrStr, build_v1_tokenizer, setup_logging
from .train_v1 import build_v1_model_and_collators


def main(argv=None):
    setup_logging()
    parser = argparse.ArgumentParser()
    parser.add_argument("-task", default="ranking")
    parser.add_argument("-model", default="knrm")
    parser.add_argument("-dev", required=True, action=DictOrStr)
    parser.add_argument("-vocab", default=None)
    parser.add_argument("-pretrain", default=None)
    parser.add_argument("-ent_vocab", default=None, help="entity vocab file (edrm)")
    parser.add_argument("-max_ent_num", type=int, default=3)
    parser.add_argument("-max_des_len", type=int, default=20)
    parser.add_argument("-kernel_dim", type=int, default=128)
    parser.add_argument("-checkpoint", required=True)
    parser.add_argument("-out", required=True)
    parser.add_argument("-embed_dim", type=int, default=100)
    parser.add_argument("-max_query_len", type=int, default=10)
    parser.add_argument("-max_doc_len", type=int, default=256)
    parser.add_argument("-batch_size", type=int, default=32)
    parser.add_argument("-seed", type=int, default=42)
    parser.add_argument("-bert_mode", default="cls", choices=["cls", "pooling"])
    parser.add_argument("-maxp", action="store_true", default=False)
    args = parser.parse_args(argv)

    tokenizer = build_v1_tokenizer(args)
    model, params, _, make_collator = build_v1_model_and_collators(args, tokenizer)
    # restore trained params
    from ..config import TrainingArguments

    tx = make_optimizer(TrainingArguments(), 1)
    template = TrainState.create(params, tx)
    params = load_train_state(args.checkpoint, template).params

    dev_set = V1Dataset(args.dev, mode="dev", task=args.task)
    collator = make_collator("dev")

    # (score, feature-vector) per pair — the reference's per-model apply
    # dispatch (gen_feature.py:15-27)
    if args.model in ("bert", "roberta", "electra"):
        @jax.jit
        def run(params, t):
            return model.apply({"params": params}, t["input_ids"],
                               t["input_mask"], t["segment_ids"])
    elif args.model == "edrm":
        @jax.jit
        def run(params, t):
            return model.apply(
                {"params": params},
                t["query_wrd_idx"], t["query_wrd_mask"],
                t["doc_wrd_idx"], t["doc_wrd_mask"],
                t["query_ent_idx"], t["query_ent_mask"],
                t["doc_ent_idx"], t["doc_ent_mask"],
                t["query_des_idx"], t["doc_des_idx"],
            )
    else:
        @jax.jit
        def run(params, t):
            return model.apply({"params": params}, t["query_idx"],
                               t["query_mask"], t["doc_idx"], t["doc_mask"])

    lines = []
    for batch in batched(iter(dev_set), args.batch_size, collator):
        tensors = {k: jnp.asarray(v) for k, v in batch.items()
                   if not isinstance(v, list) and k not in
                   ("label", "retrieval_score")}
        scores, feats = run(params, tensors)
        if scores.ndim == 2:
            scores = jax.nn.softmax(scores, axis=-1)[:, 1]
        scores = np.asarray(scores, np.float32)
        feats = np.asarray(feats, np.float32)
        labels = batch.get("label", np.zeros(len(scores), np.int32))
        rscores = batch.get("retrieval_score", np.zeros(len(scores), np.float32))
        for qid, did, label, f, s, r in zip(
            batch["query_id"], batch["doc_id"], labels, feats, scores, rscores
        ):
            parts = [str(int(label)), f"id:{qid}"]
            parts += [f"{i + 1}:{v}" for i, v in enumerate(f)]
            parts.append(f"{len(f) + 1}:{s}")
            parts.append(f"{len(f) + 2}:{r}")
            parts.append(f"# {did}")
            lines.append(" ".join(parts))

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} feature lines -> {args.out}")


if __name__ == "__main__":
    main()
