"""Train a v1-family reranker (KNRM/Conv-KNRM/TK/EDRM/Bert).

Reference: /root/reference/v1/train.py. Example:

    python -m openmatch_tpu.drivers.train_v1 \
        -model knrm -task ranking -ranking_loss margin_loss \
        -train train.jsonl -dev dev.jsonl -qrels qrels \
        -vocab vocab.txt [-pretrain glove.txt] \
        -save checkpoints/knrm -res results/knrm.trec \
        -epoch 1 -batch_size 8 -lr 0.001 -eval_every 100
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainingArguments
from ..data.loader import batched
from ..train.v1_trainer import V1Trainer, predict_scores
from ..utils.metrics import evaluate_run, load_qrels
from ..utils.trec import save_as_trec
from ..v1.dataset import V1Dataset, WordCollator
from ..v1.models import KNRM, TK, ConvKNRM
from ..v1.tokenizer import WordTokenizer


def build_word_model(args, tokenizer):
    vocab_size = tokenizer.get_vocab_size()
    embed_dim = tokenizer.get_embed_dim() if tokenizer.get_embed_dim() > 0 else args.embed_dim
    if args.model == "knrm":
        model = KNRM(vocab_size=vocab_size, embed_dim=embed_dim, task=args.task)
    elif args.model in ("cknrm", "conv_knrm"):
        model = ConvKNRM(vocab_size=vocab_size, embed_dim=embed_dim, task=args.task)
    elif args.model == "tk":
        model = TK(vocab_size=vocab_size, embed_dim=embed_dim, task=args.task)
    else:
        raise ValueError(f"Unknown v1 model {args.model}")
    ids = jnp.zeros((1, args.max_query_len), jnp.int32)
    mask = jnp.ones((1, args.max_query_len), jnp.float32)
    d_ids = jnp.zeros((1, args.max_doc_len), jnp.int32)
    d_mask = jnp.ones((1, args.max_doc_len), jnp.float32)
    params = model.init(jax.random.PRNGKey(args.seed), ids, mask, d_ids, d_mask)["params"]
    if tokenizer.get_embed_matrix() is not None:
        params = dict(params)
        params["embedder"] = {"embedding": jnp.asarray(np.asarray(tokenizer.get_embed_matrix(), np.float32))}
    return model, params


def word_score_fn(model):
    def fn(params, batch):
        score, _ = model.apply(
            {"params": params},
            batch["query_idx"], batch["query_mask"],
            batch["doc_idx"], batch["doc_mask"],
        )
        return score

    return fn


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-task", default="ranking")
    parser.add_argument("-model", default="knrm")
    parser.add_argument("-ranking_loss", default="margin_loss")
    parser.add_argument("-train", required=True)
    parser.add_argument("-dev", default=None)
    parser.add_argument("-qrels", default=None)
    parser.add_argument("-vocab", default=None)
    parser.add_argument("-pretrain", default=None, help="GloVe embedding file")
    parser.add_argument("-save", default="./checkpoints/v1")
    parser.add_argument("-res", default="./results/v1.trec")
    parser.add_argument("-metric", default="ndcg_cut_10")
    parser.add_argument("-embed_dim", type=int, default=100)
    parser.add_argument("-max_query_len", type=int, default=10)
    parser.add_argument("-max_doc_len", type=int, default=256)
    parser.add_argument("-epoch", type=int, default=1)
    parser.add_argument("-batch_size", type=int, default=8)
    parser.add_argument("-lr", type=float, default=1e-3)
    parser.add_argument("-eval_every", type=int, default=1000)
    parser.add_argument("-seed", type=int, default=42)
    parser.add_argument("-max_input", type=int, default=1_280_000)
    args = parser.parse_args(argv)

    tokenizer = WordTokenizer(vocab=args.vocab, pretrained=args.pretrain)
    model, params = build_word_model(args, tokenizer)
    score_fn = word_score_fn(model)

    train_set = V1Dataset(args.train, mode="train", task=args.task, max_input=args.max_input)
    train_collator = WordCollator(tokenizer, args.max_query_len, args.max_doc_len,
                                  mode="train", task=args.task)
    steps_per_epoch = max(len(train_set) // args.batch_size, 1)
    total_steps = steps_per_epoch * args.epoch

    train_args = TrainingArguments(
        output_dir=args.save, learning_rate=args.lr, warmup_ratio=0.1,
        logging_steps=max(args.eval_every, 1), eval_steps=args.eval_every,
        save_steps=0, seed=args.seed, margin=1.0,
    )
    trainer = V1Trainer(score_fn, params, train_args, total_steps,
                        task=args.task, ranking_loss_kind=args.ranking_loss)

    eval_fn = None
    if args.dev and args.qrels:
        dev_set = V1Dataset(args.dev, mode="dev", task=args.task, max_input=args.max_input)
        dev_collator = WordCollator(tokenizer, args.max_query_len, args.max_doc_len,
                                    mode="dev", task=args.task)
        qrels = load_qrels(args.qrels)

        def eval_fn(tr):
            batches = batched(iter(dev_set), args.batch_size, dev_collator)
            result = predict_scores(score_fn, jax.device_get(tr.state.params), batches, args.task)
            os.makedirs(os.path.dirname(args.res) or ".", exist_ok=True)
            save_as_trec(result, args.res)
            metric = evaluate_run(qrels, result, [args.metric])[args.metric]
            print(f"dev {args.metric}: {metric:.4f}")
            return metric

    def data_iter():
        for _ in range(args.epoch):
            yield from batched(iter(train_set), args.batch_size, train_collator, drop_last=True)

    out = trainer.train(data_iter(), eval_fn=eval_fn)
    trainer.save_checkpoint(args.save)
    if eval_fn is not None:
        eval_fn(trainer)
    print(f"finished at step {out['final_step']}")


if __name__ == "__main__":
    main()
