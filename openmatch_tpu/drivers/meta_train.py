"""Meta learning-to-reweight training (Meta-LTR).

Reference: /root/reference/v1/meta_dist_train.py — the standalone meta
training CLI: source pairs (-train) are reweighted per batch by the
meta-gradient of the TARGET-domain batch loss (-target, cycled endlessly
like RecurrDataLoader), with optional per-step weight logging
(-log_weights -> weights.txt) and dev evaluation keeping the best
checkpoint (-eval_during_train). The target-domain pairing that
MetaBertDataset provides (v1/OpenMatch/data/datasets/meta_bert_dataset.py,
mode='target' with the train-style pair format) maps to a second
V1Dataset in train mode.

Example:

    python -m openmatch_tpu.drivers.meta_train \
        -model knrm -train source.jsonl -target target.jsonl \
        -dev dev.jsonl -qrels qrels -vocab vocab.txt \
        -save_folder ckpt -eval_during_train -log_weights \
        -epoch 1 -train_batch_size 8 -target_batch_size 8 -lr 0.001
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..config import TrainingArguments
from ..data.loader import batched
from ..train.meta_trainer import CyclingIterator, MetaLTRTrainer
from ..train.v1_trainer import predict_scores
from ..utils.metrics import evaluate_run, load_qrels
from ..utils.trec import save_as_trec
from ..v1.dataset import V1Dataset
from .common import DictOrStr, build_v1_tokenizer, setup_logging
from .train_v1 import build_v1_model_and_collators


def main(argv=None):
    setup_logging()
    parser = argparse.ArgumentParser()
    parser.add_argument("-task", default="ranking")
    parser.add_argument("-model", default="bert")
    parser.add_argument("-ranking_loss", default="margin_loss")
    parser.add_argument("-train", required=True, action=DictOrStr,
                        help="source-domain pairs")
    parser.add_argument("-target", required=True, action=DictOrStr,
                        help="target-domain pairs (cycled; the meta reward signal)")
    parser.add_argument("-dev", default=None, action=DictOrStr)
    parser.add_argument("-qrels", default=None)
    parser.add_argument("-vocab", default=None)
    parser.add_argument("-pretrain", default=None)
    parser.add_argument("-ent_vocab", default=None, help="entity vocab file (edrm)")
    parser.add_argument("-max_ent_num", type=int, default=3)
    parser.add_argument("-max_des_len", type=int, default=20)
    parser.add_argument("-kernel_dim", type=int, default=128)
    parser.add_argument("-bert_mode", default="cls", choices=["cls", "pooling"])
    parser.add_argument("-metric", default="ndcg_cut_10")
    parser.add_argument("-embed_dim", type=int, default=100)
    parser.add_argument("-max_query_len", type=int, default=20)
    parser.add_argument("-max_doc_len", type=int, default=150)
    parser.add_argument("-epoch", type=int, default=1)
    parser.add_argument("-train_batch_size", type=int, default=8)
    parser.add_argument("-target_batch_size", type=int, default=8)
    parser.add_argument("-dev_eval_batch_size", type=int, default=128)
    parser.add_argument("-lr", type=float, default=2e-5)
    parser.add_argument("-n_warmup_steps", type=int, default=1000)
    parser.add_argument("-eval_every", type=int, default=1000)
    parser.add_argument("-eval_during_train", action="store_true", default=False)
    parser.add_argument("-log_weights", action="store_true", default=False)
    parser.add_argument("-save_folder", required=True)
    parser.add_argument("-seed", type=int, default=42)
    parser.add_argument("-max_input", type=int, default=1_280_000)
    args = parser.parse_args(argv)

    os.makedirs(args.save_folder, exist_ok=True)
    # the same model zoo as the sibling v1 CLIs (train_v1/inference_v1):
    # bert/roberta over an HF checkpoint, edrm with the entity channel,
    # word-family otherwise — one shared construction path
    tokenizer = build_v1_tokenizer(args)
    model, params, score_fn, make_collator = build_v1_model_and_collators(args, tokenizer)

    train_set = V1Dataset(args.train, mode="train", task=args.task, max_input=args.max_input)
    # the reference's MetaBertDataset mode='target' parses the SAME pair
    # format as train (meta_bert_dataset.py:41,95-99)
    target_set = V1Dataset(args.target, mode="train", task=args.task, max_input=args.max_input)
    train_collator = make_collator("train")

    steps_per_epoch = max(len(train_set) // args.train_batch_size, 1)
    total_steps = steps_per_epoch * args.epoch

    train_args = TrainingArguments(
        output_dir=args.save_folder, learning_rate=args.lr,
        warmup_steps=args.n_warmup_steps, logging_steps=max(args.eval_every, 1),
        eval_steps=args.eval_every if args.eval_during_train else None,
        save_steps=0, seed=args.seed, margin=1.0,
    )
    trainer = MetaLTRTrainer(
        score_fn, params, train_args, total_steps, task=args.task,
        ranking_loss_kind=args.ranking_loss,
        log_weights_path=os.path.join(args.save_folder, "weights.txt")
        if args.log_weights else None,
    )

    eval_fn = None
    if args.eval_during_train:
        if not (args.dev and args.qrels):
            raise ValueError("-eval_during_train needs -dev and -qrels")
        dev_set = V1Dataset(args.dev, mode="dev", task=args.task, max_input=args.max_input)
        dev_collator = make_collator("dev")
        qrels = load_qrels(args.qrels)
        res_path = os.path.join(args.save_folder, "latest_dev.trec")

        def eval_fn(tr):
            batches = batched(iter(dev_set), args.dev_eval_batch_size, dev_collator)
            result = predict_scores(score_fn, jax.device_get(tr.state.params), batches, args.task)
            save_as_trec(result, res_path)
            metric = evaluate_run(qrels, result, [args.metric])[args.metric]
            print(f"dev {args.metric}: {metric:.4f}")
            return metric

    def data_iter():
        for _ in range(args.epoch):
            yield from batched(iter(train_set), args.train_batch_size,
                               train_collator, drop_last=True)

    target_iter = CyclingIterator(
        lambda: batched(iter(target_set), args.target_batch_size,
                        train_collator, drop_last=True)
    )

    out = trainer.train(data_iter(), target_iter, eval_fn=eval_fn)
    trainer.save_checkpoint(os.path.join(args.save_folder, "final"))
    if eval_fn is not None:
        eval_fn(trainer)
    w = np.concatenate(out["weights"]) if out["weights"] else np.zeros(1)
    print(f"finished at step {out['final_step']}; "
          f"mean weight {w.mean():.4f}, zero-weight fraction {(w == 0).mean():.2f}")


if __name__ == "__main__":
    main()
