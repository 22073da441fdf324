"""Batch-score a dev/test set with a v1 model and write a TREC run.

Reference: /root/reference/v1/inference.py.

    python -m openmatch_tpu.drivers.inference_v1 \
        -model knrm -test test.jsonl -vocab vocab.txt \
        -checkpoint checkpoints/knrm -res run.trec
"""

from __future__ import annotations

import argparse
import os

import jax

from ..data.loader import batched
from ..train.state import TrainState, load_train_state, make_optimizer
from ..train.v1_trainer import predict_scores
from ..utils.trec import save_as_trec
from ..v1.dataset import V1Dataset
from .common import DictOrStr, build_v1_tokenizer, setup_logging
from .train_v1 import build_v1_model_and_collators


def main(argv=None):
    setup_logging()
    parser = argparse.ArgumentParser()
    parser.add_argument("-task", default="ranking")
    parser.add_argument("-model", default="knrm")
    parser.add_argument("-test", required=True, action=DictOrStr)
    parser.add_argument("-vocab", default=None)
    parser.add_argument("-pretrain", default=None)
    parser.add_argument("-ent_vocab", default=None, help="entity vocab file (edrm)")
    parser.add_argument("-max_ent_num", type=int, default=3)
    parser.add_argument("-max_des_len", type=int, default=20)
    parser.add_argument("-kernel_dim", type=int, default=128)
    parser.add_argument("-checkpoint", required=True)
    parser.add_argument("-res", required=True)
    parser.add_argument("-mode", default="test", choices=["dev", "test"])
    parser.add_argument("-embed_dim", type=int, default=100)
    parser.add_argument("-max_query_len", type=int, default=10)
    parser.add_argument("-max_doc_len", type=int, default=256)
    parser.add_argument("-batch_size", type=int, default=32)
    parser.add_argument("-seed", type=int, default=42)
    parser.add_argument("-bert_mode", default="cls", choices=["cls", "pooling"],
                        help="BertRanker rep for -model bert")
    parser.add_argument("-maxp", action="store_true", default=False,
                        help="BertMaxP chunk-and-maxpool long-doc scoring")
    args = parser.parse_args(argv)

    tokenizer = build_v1_tokenizer(args)
    model, params, score_fn, make_collator = build_v1_model_and_collators(args, tokenizer)
    from ..config import TrainingArguments

    tx = make_optimizer(TrainingArguments(), 1)
    template = TrainState.create(params, tx)
    params = load_train_state(args.checkpoint, template).params

    dataset = V1Dataset(args.test, mode=args.mode, task=args.task)
    collator = make_collator(args.mode)
    batches = batched(iter(dataset), args.batch_size, collator)
    result = predict_scores(score_fn, jax.device_get(params), batches, args.task)
    os.makedirs(os.path.dirname(args.res) or ".", exist_ok=True)
    save_as_trec(result, args.res)
    print(f"wrote {len(result)} queries -> {args.res}")


if __name__ == "__main__":
    main()
