"""Meta-LTR as a runnable training mode (reference v1/meta_dist_train.py):
target-domain pairing, per-pair meta weights, weight logging, and the
meta_train CLI."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.config import TrainingArguments
from openmatch_tpu.data.loader import batched
from openmatch_tpu.train.meta_trainer import CyclingIterator, MetaLTRTrainer
from openmatch_tpu.train.v1_trainer import V1Trainer, predict_scores
from openmatch_tpu.v1.dataset import V1Dataset, WordCollator
from openmatch_tpu.v1.models import KNRM
from openmatch_tpu.v1.tokenizer import WordTokenizer


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("meta_vocab")
    words = ["apple", "banana", "cherry", "grape", "melon", "fruit", "stone", "rock"]
    (d / "vocab.txt").write_text("\n".join(words))
    return str(d / "vocab.txt")


def _clean_row(i):
    fruits = ["apple", "banana", "cherry", "grape"]
    f = fruits[i % 4]
    return {"query": f"{f} fruit", "doc_pos": f"{f} {f} fruit", "doc_neg": "stone rock"}


def _corrupt_row(i):
    # pos/neg swapped: trains the model in exactly the wrong direction
    r = _clean_row(i)
    return {"query": r["query"], "doc_pos": r["doc_neg"], "doc_neg": r["doc_pos"]}


def _fixture_files(tmp_path, n=16):
    # even positions clean, odd corrupted -> within every size-8 batch the
    # even slots are clean and the odd slots corrupted (no shuffling)
    src = [(_clean_row(i) if i % 2 == 0 else _corrupt_row(i)) for i in range(n)]
    train = tmp_path / "source.jsonl"
    train.write_text("\n".join(json.dumps(r) for r in src) + "\n")
    tgt = [_clean_row(i) for i in range(8)]
    target = tmp_path / "target.jsonl"
    target.write_text("\n".join(json.dumps(r) for r in tgt) + "\n")
    dev_rows = [
        {"label": 1, "query_id": "q1", "doc_id": "dp", "retrieval_score": 1.0,
         "query": "apple fruit", "doc": "apple apple fruit"},
        {"label": 0, "query_id": "q1", "doc_id": "dn", "retrieval_score": 0.5,
         "query": "apple fruit", "doc": "stone rock"},
    ]
    dev = tmp_path / "dev.jsonl"
    dev.write_text("\n".join(json.dumps(r) for r in dev_rows) + "\n")
    qrels = tmp_path / "qrels"
    qrels.write_text("q1 0 dp 1\nq1 0 dn 0\n")
    return str(train), str(target), str(dev), str(qrels)


def _build_knrm(vocab_file, seed=0):
    tok = WordTokenizer(vocab=vocab_file, if_swr=False, if_stem=False)
    model = KNRM(vocab_size=tok.get_vocab_size(), embed_dim=8)
    q = jnp.zeros((1, 4), jnp.int32)
    qm = jnp.ones((1, 4), jnp.float32)
    d = jnp.zeros((1, 8), jnp.int32)
    dm = jnp.ones((1, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), q, qm, d, dm)["params"]

    def score_fn(p, batch):
        s, _ = model.apply({"params": p}, batch["query_idx"], batch["query_mask"],
                           batch["doc_idx"], batch["doc_mask"])
        return s

    return tok, model, params, score_fn


class TestCyclingIterator:
    def test_restarts_on_exhaustion(self):
        it = CyclingIterator(lambda: iter([1, 2, 3]))
        assert [next(it) for _ in range(7)] == [1, 2, 3, 1, 2, 3, 1]


class TestMetaTrainer:
    def test_corrupted_pairs_get_zero_weight_and_dev_improves(
            self, vocab_file, mesh8, tmp_path):
        """VERDICT done-criteria: corrupted source pairs receive ~zero
        weight and the dev outcome beats unweighted training on the same
        corrupted source."""
        tok, model, params, score_fn = _build_knrm(vocab_file)
        train, target, dev, qrels = _fixture_files(tmp_path)
        collator = WordCollator(tok, query_max_len=4, doc_max_len=8, mode="train")
        ds = V1Dataset(train, mode="train", task="ranking")
        tgt_ds = V1Dataset(target, mode="train", task="ranking")

        args = TrainingArguments(
            output_dir=str(tmp_path / "meta_out"), learning_rate=0.1,
            warmup_ratio=0.0, logging_steps=1000, save_steps=0,
        )
        STEPS = 30
        trainer = MetaLTRTrainer(score_fn, params, args, total_steps=STEPS,
                                 ranking_loss_kind="triplet_loss", mesh=mesh8)

        def data():
            for _ in range(STEPS):
                yield from batched(iter(ds), 8, collator, drop_last=True)

        target_iter = CyclingIterator(
            lambda: batched(iter(tgt_ds), 8, collator, drop_last=True))
        out = trainer.train(data(), target_iter)
        W = np.stack(out["weights"])  # [steps, 8]
        clean_w, corrupt_w = W[:, 0::2].mean(), W[:, 1::2].mean()
        assert corrupt_w < 0.02, (clean_w, corrupt_w)
        assert clean_w > 5 * max(corrupt_w, 1e-6)

        # unweighted baseline on the same corrupted source
        base = V1Trainer(score_fn, params, args, total_steps=STEPS,
                         ranking_loss_kind="triplet_loss", mesh=mesh8)
        for batch in data():
            if int(base.state.step) >= STEPS:
                break
            base.train_step(batch)

        dev_ds = V1Dataset(dev, mode="dev")
        dev_coll = WordCollator(tok, query_max_len=4, doc_max_len=8, mode="dev")

        def sep(p):
            r = predict_scores(score_fn, jax.device_get(p),
                               batched(iter(dev_ds), 2, dev_coll))
            return r["q1"]["dp"] - r["q1"]["dn"]

        meta_sep = sep(trainer.state.params)
        base_sep = sep(base.state.params)
        assert meta_sep > 0  # meta model ranks the relevant doc first
        assert meta_sep > base_sep + 0.1, (meta_sep, base_sep)


class TestCLI:
    def test_meta_train_end_to_end(self, vocab_file, tmp_path, capsys):
        from openmatch_tpu.drivers import meta_train

        train, target, dev, qrels = _fixture_files(tmp_path)
        save = tmp_path / "run"
        meta_train.main([
            "-model", "knrm", "-task", "ranking",
            "-ranking_loss", "triplet_loss",
            "-train", train, "-target", target,
            "-dev", dev, "-qrels", qrels, "-vocab", vocab_file,
            "-save_folder", str(save), "-metric", "ndcg_cut_10",
            "-embed_dim", "8", "-max_query_len", "4", "-max_doc_len", "8",
            "-epoch", "4", "-train_batch_size", "8", "-target_batch_size", "8",
            "-lr", "0.05", "-n_warmup_steps", "0", "-eval_every", "2",
            "-eval_during_train", "-log_weights",
        ])
        out = capsys.readouterr().out
        assert "mean weight" in out
        weights = (save / "weights.txt").read_text().strip().splitlines()
        assert weights and all(len(l.split("\t")) == 9 for l in weights)
        assert (save / "best" / "train_state.msgpack").exists()
        assert (save / "final" / "train_state.msgpack").exists()
        assert (save / "latest_dev.trec").exists()

    def test_bert_model_path(self, tmp_path):
        """-model bert -pretrain <ckpt> (the invocation style every
        sibling v1 CLI documents) builds a BertRanker from a local tiny
        HF checkpoint and runs one meta step (the reference driver's
        only model). meta_train used to read the tokenizer from -vocab
        only and crash on this exact call."""
        from transformers import BertConfig as HFBertConfig, BertModel, BertTokenizerFast

        ckpt = tmp_path / "tinybert"
        cfg = HFBertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                           num_attention_heads=2, intermediate_size=32,
                           max_position_embeddings=64)
        BertModel(cfg).save_pretrained(ckpt)
        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "apple", "fruit",
             "stone", "rock", "banana"] + [f"w{i}" for i in range(22)]))
        BertTokenizerFast(vocab_file=str(vocab)).save_pretrained(ckpt)

        from openmatch_tpu.drivers import meta_train

        train, target, dev, qrels = _fixture_files(tmp_path, n=8)
        save = tmp_path / "bert_run"
        meta_train.main([
            "-model", "bert", "-task", "ranking",
            "-train", train, "-target", target, "-pretrain", str(ckpt),
            "-save_folder", str(save),
            "-max_query_len", "4", "-max_doc_len", "8",
            "-epoch", "1", "-train_batch_size", "8", "-target_batch_size", "8",
            "-lr", "0.001", "-n_warmup_steps", "0",
        ])
        assert (save / "final" / "train_state.msgpack").exists()
