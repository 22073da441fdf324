"""Train a v1-family reranker (KNRM/Conv-KNRM/TK/EDRM/Bert).

Reference: /root/reference/v1/train.py, including the ``-reinfoselect``
data-selection training mode (flag at train.py:423, policy construction
at :691-698, loop at :55-265) and its ``-reset``/``-tau`` knobs.

Example:

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
from ..train.reinfoselect_trainer import ReInfoSelectTrainer
from ..train.v1_trainer import V1Trainer, predict_scores
from ..utils.metrics import evaluate_run, load_qrels
from ..utils.trec import save_as_trec
from ..v1.dataset import BertPairCollator, V1Dataset, WordCollator
from ..v1.long_doc import EDRMCollator
from ..v1.models import EDRM, KNRM, TK, BertRanker, ConvKNRM
from ..v1.tokenizer import WordTokenizer
from .common import DictOrStr, build_v1_tokenizer, setup_logging


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


def build_edrm_model(args, tokenizer, ent_tokenizer):
    """EDRM (reference v1/OpenMatch/models/edrm.py:10-74): word channel +
    entity channel enriched by description convolutions."""
    wrd_dim = tokenizer.get_embed_dim() if tokenizer.get_embed_dim() > 0 else args.embed_dim
    model = EDRM(
        wrd_vocab_size=tokenizer.get_vocab_size(),
        ent_vocab_size=ent_tokenizer.get_vocab_size(),
        wrd_embed_dim=wrd_dim,
        ent_embed_dim=args.kernel_dim,
        max_des_len=args.max_des_len,
        max_ent_num=args.max_ent_num,
        kernel_dim=args.kernel_dim,
        task=args.task,
    )
    B, QL, DL, E, DES = 1, args.max_query_len, args.max_doc_len, args.max_ent_num, args.max_des_len
    z = lambda *shape: jnp.zeros(shape, jnp.int32)
    o = lambda *shape: jnp.ones(shape, jnp.float32)
    params = model.init(
        jax.random.PRNGKey(args.seed),
        z(B, QL), o(B, QL), z(B, DL), o(B, DL),
        z(B, E), o(B, E), z(B, E), o(B, E),
        z(B, E * DES), z(B, E * DES),
    )["params"]
    if tokenizer.get_embed_matrix() is not None:
        params = dict(params)
        params["wrd_embedder"] = {
            "embedding": jnp.asarray(np.asarray(tokenizer.get_embed_matrix(), np.float32))
        }
    return model, params


def edrm_score_fn(model):
    def fn(params, batch):
        score, _ = model.apply(
            {"params": params},
            batch["query_wrd_idx"], batch["query_wrd_mask"],
            batch["doc_wrd_idx"], batch["doc_wrd_mask"],
            batch["query_ent_idx"], batch["query_ent_mask"],
            batch["doc_ent_idx"], batch["doc_ent_mask"],
            batch["query_des_idx"], batch["doc_des_idx"],
        )
        return score

    return fn


def build_bert_ranker(pretrain: str, mode: str, task: str, seed: int = 42,
                      maxp: bool = False, num_passages: int = 4):
    """(model, params, score_fn) — BertRanker (or BertMaxP when ``maxp``,
    reference v1/train.py:623-630) over a pretrained HF checkpoint
    (reference v1/train.py:625-642: om.models.Bert)."""
    from ..models.hf_convert import load_bert_encoder
    from ..v1.models import BertMaxP

    config, enc_params = load_bert_encoder(pretrain)
    if mode == "pooling" and not getattr(config, "add_pooler", False):
        # roberta/electra checkpoints carry no pooler weights (the
        # reference reaches them through AutoModel the same way,
        # v1/OpenMatch/models/bert.py:30-39) — fail actionably instead of
        # a KeyError('pooler_output') deep inside model.init
        raise ValueError(
            "-bert_mode pooling needs a BERT checkpoint with a pooler; "
            "this checkpoint has none (roberta/electra) — use the "
            "default cls mode")
    if maxp:
        model = BertMaxP(config=config, num_passages=num_passages,
                         mode=mode, task=task)
        ids = jnp.zeros((1, num_passages, 8), jnp.int32)
    else:
        model = BertRanker(config=config, mode=mode, task=task)
        ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones_like(ids)
    init_params = model.init(jax.random.PRNGKey(seed), ids, mask, ids * 0)["params"]
    params = dict(init_params)
    params["bert"] = jax.tree.map(jnp.asarray, enc_params)

    def score_fn(p, batch):
        s, _ = model.apply({"params": p}, batch["input_ids"],
                           batch["input_mask"], batch["segment_ids"])
        return s

    return model, params, score_fn


def build_v1_model_and_collators(args, tokenizer):
    """(model, params, score_fn, make_collator) for a v1 model.

    make_collator(mode) builds the matching collator; EDRM needs the
    entity-aware one (reference v1/train.py:176-194 routes edrm batches
    through the extra entity tensors); bert is a cross-encoder over
    [CLS] q [SEP] d [SEP] inputs (``tokenizer`` is then an HF
    tokenizer, not the WordTokenizer)."""
    if args.model in ("bert", "roberta", "electra"):
        # roberta/electra ride the same path (reference reaches both via
        # AutoModel, v1/OpenMatch/models/bert.py:30-39): load_bert_encoder
        # normalizes the HF prefix, BertConfig.from_hf_config sets the
        # roberta position offset and the electra embeddings_project
        # geometry; segment ids are zeros (reference train.py:86-90 calls
        # the roberta model without them). electra must score in the
        # default cls mode — ElectraModel has no pooler.
        if not getattr(args, "pretrain", None):
            raise ValueError(f"-model {args.model} requires -pretrain (HF checkpoint dir)")
        maxp = bool(getattr(args, "maxp", False))
        model, params, score_fn = build_bert_ranker(
            args.pretrain, getattr(args, "bert_mode", "cls"), args.task,
            args.seed, maxp=maxp)

        def make_collator(mode):
            if maxp:
                from ..v1.long_doc import BertMaxPCollator

                return BertMaxPCollator(tokenizer, args.max_query_len,
                                        args.max_doc_len, mode=mode,
                                        task=args.task)
            return BertPairCollator(tokenizer, args.max_query_len,
                                    args.max_doc_len, mode=mode, task=args.task)

        return model, params, score_fn, make_collator

    if args.model == "edrm":
        if not getattr(args, "ent_vocab", None):
            raise ValueError("-model edrm requires -ent_vocab (entity vocab file)")
        ent_tokenizer = WordTokenizer(vocab=args.ent_vocab, if_swr=False, if_stem=False)
        model, params = build_edrm_model(args, tokenizer, ent_tokenizer)

        def make_collator(mode):
            return EDRMCollator(
                tokenizer, ent_tokenizer, args.max_query_len, args.max_doc_len,
                args.max_ent_num, args.max_des_len, mode=mode, task=args.task,
            )

        return model, params, edrm_score_fn(model), make_collator

    model, params = build_word_model(args, tokenizer)

    def make_collator(mode):
        return WordCollator(tokenizer, args.max_query_len, args.max_doc_len,
                            mode=mode, task=args.task)

    return model, params, word_score_fn(model), make_collator


def build_policy(args, tokenizer):
    """ReInfoSelect keep/drop policy: a ConvKNRM with a 2-class head over
    the positive pair, sharing the ranker's vocabulary and pretrained
    embeddings (reference /root/reference/v1/train.py:691-698)."""
    vocab_size = tokenizer.get_vocab_size()
    embed_dim = tokenizer.get_embed_dim() if tokenizer.get_embed_dim() > 0 else args.embed_dim
    policy = ConvKNRM(vocab_size=vocab_size, embed_dim=embed_dim, task="classification")
    ids = jnp.zeros((1, args.max_query_len), jnp.int32)
    mask = jnp.ones((1, args.max_query_len), jnp.float32)
    d_ids = jnp.zeros((1, args.max_doc_len), jnp.int32)
    d_mask = jnp.ones((1, args.max_doc_len), jnp.float32)
    params = policy.init(jax.random.PRNGKey(args.seed + 1), ids, mask, d_ids, d_mask)["params"]
    if tokenizer.get_embed_matrix() is not None:
        params = dict(params)
        params["embedder"] = {"embedding": jnp.asarray(np.asarray(tokenizer.get_embed_matrix(), np.float32))}
    return policy, params


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
    setup_logging()
    parser = argparse.ArgumentParser()
    parser.add_argument("-task", default="ranking")
    parser.add_argument("-model", default="knrm")
    parser.add_argument("-ranking_loss", default="margin_loss")
    parser.add_argument("-train", required=True, action=DictOrStr)
    parser.add_argument("-dev", default=None, action=DictOrStr)
    parser.add_argument("-qrels", default=None)
    parser.add_argument("-vocab", default=None)
    parser.add_argument("-pretrain", default=None, help="GloVe embedding file")
    parser.add_argument("-ent_vocab", default=None, help="entity vocab file (edrm)")
    parser.add_argument("-max_ent_num", type=int, default=3)
    parser.add_argument("-max_des_len", type=int, default=20)
    parser.add_argument("-kernel_dim", type=int, default=128)
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
    parser.add_argument("-reinfoselect", action="store_true", default=False,
                        help="ReInfoSelect data-selection mode (reference "
                             "train.py:423): a ConvKNRM classification policy "
                             "picks which pairs train the ranker, updated by "
                             "REINFORCE on the dev-metric delta")
    parser.add_argument("-reset", action="store_true", default=False,
                        help="reload the best checkpoint after each policy "
                             "refresh (reference train.py:259-262)")
    parser.add_argument("-tau", type=float, default=1.0,
                        help="gumbel-softmax temperature (reference train.py:446)")
    parser.add_argument("-bert_mode", default="cls", choices=["cls", "pooling"],
                        help="BertRanker rep (reference -mode, train.py:436; "
                             "renamed to avoid the dataset-mode flag)")
    parser.add_argument("-maxp", action="store_true", default=False,
                        help="BertMaxP chunk-and-maxpool long-doc scoring "
                             "(reference train.py:623-630)")
    args = parser.parse_args(argv)
    if args.maxp and args.reinfoselect:
        raise ValueError("-maxp and -reinfoselect cannot combine (the policy "
                         "scores flat cross-encoder inputs)")

    tokenizer = build_v1_tokenizer(args)
    model, params, score_fn, make_collator = build_v1_model_and_collators(args, tokenizer)

    train_set = V1Dataset(args.train, mode="train", task=args.task, max_input=args.max_input)
    train_collator = make_collator("train")
    steps_per_epoch = max(len(train_set) // args.batch_size, 1)
    total_steps = steps_per_epoch * args.epoch

    train_args = TrainingArguments(
        output_dir=args.save, learning_rate=args.lr, warmup_ratio=0.1,
        logging_steps=max(args.eval_every, 1), eval_steps=args.eval_every,
        save_steps=0, seed=args.seed, margin=1.0,
    )
    if args.reinfoselect:
        if not (args.dev and args.qrels):
            raise ValueError("-reinfoselect needs -dev and -qrels: the policy's "
                             "REINFORCE reward is the dev-metric delta")
        if args.model in ("bert", "roberta", "electra"):
            # bert policy = Bert classification head, reference train.py:637-642
            _, policy_params, policy_score_fn = build_bert_ranker(
                args.pretrain, args.bert_mode, "classification", args.seed + 1)
        else:
            policy, policy_params = build_policy(args, tokenizer)
            policy_score_fn = word_score_fn(policy)
        trainer = ReInfoSelectTrainer(
            score_fn, params, policy_score_fn, policy_params,
            train_args, total_steps, task=args.task,
            ranking_loss_kind=args.ranking_loss, tau=args.tau, reset=args.reset,
        )
    else:
        trainer = V1Trainer(score_fn, params, train_args, total_steps,
                            task=args.task, ranking_loss_kind=args.ranking_loss)

    eval_fn = None
    if args.dev and args.qrels:
        dev_set = V1Dataset(args.dev, mode="dev", task=args.task, max_input=args.max_input)
        dev_collator = make_collator("dev")
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

    if args.reinfoselect:
        out = trainer.train(data_iter(), eval_fn)
        rates = out["keep_rates"]
        print(f"keep-rate {np.mean(rates):.2f} over {len(rates)} selection steps")
    else:
        out = trainer.train(data_iter(), eval_fn=eval_fn)
    trainer.save_checkpoint(args.save)
    if eval_fn is not None:
        eval_fn(trainer)
    print(f"finished at step {out['final_step']}")


if __name__ == "__main__":
    main()
