"""v1 pipeline: word tokenizer, datasets, trainer losses, score prediction."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.config import TrainingArguments
from openmatch_tpu.data.loader import batched
from openmatch_tpu.train.v1_trainer import V1Trainer, predict_scores, ranking_loss
from openmatch_tpu.v1.dataset import V1Dataset, WordCollator
from openmatch_tpu.v1.models import KNRM
from openmatch_tpu.v1.tokenizer import WordTokenizer


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("v1tok")
    words = ["apple", "banana", "cherry", "grape", "melon", "fruit", "stone", "rock"]
    (d / "vocab.txt").write_text("\n".join(words))
    return str(d / "vocab.txt")


@pytest.fixture(scope="module")
def glove_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("glove")
    rng = np.random.RandomState(0)
    lines = []
    for w in ["apple", "banana", "rock"]:
        vec = " ".join(f"{x:.4f}" for x in rng.randn(8))
        lines.append(f"{w} {vec}")
    (d / "glove.txt").write_text("\n".join(lines))
    return str(d / "glove.txt")


class TestWordTokenizer:
    def test_vocab_ids_and_masks(self, vocab_file):
        tok = WordTokenizer(vocab=vocab_file, if_swr=False, if_stem=False)
        ids, masks = tok.process("apple banana unknownword", max_len=5)
        assert len(ids) == 5
        assert ids[0] == tok._token2id["apple"]
        assert ids[2] == 0  # OOV -> pad id
        assert masks == [1, 1, 0, 0, 0]

    def test_glove_pretrained(self, glove_file):
        tok = WordTokenizer(pretrained=glove_file, if_swr=False, if_stem=False)
        assert tok.get_vocab_size() == 4  # pad + 3
        assert tok.get_embed_dim() == 8
        mat = np.asarray(tok.get_embed_matrix())
        np.testing.assert_array_equal(mat[0], np.zeros(8))  # pad row zero

    def test_truncation(self, vocab_file):
        tok = WordTokenizer(vocab=vocab_file, if_swr=False, if_stem=False)
        ids, _ = tok.process("apple " * 20, max_len=4)
        assert len(ids) == 4


class TestV1Dataset:
    def test_jsonl_ranking(self, tmp_path):
        p = tmp_path / "train.jsonl"
        p.write_text(json.dumps({"query": "q", "doc_pos": "a", "doc_neg": "b"}) + "\n")
        ds = V1Dataset(str(p), mode="train", task="ranking")
        assert ds[0]["doc_pos"] == "a"

    def test_tsv_classification(self, tmp_path):
        p = tmp_path / "train.tsv"
        p.write_text("q\td\t1\n")
        ds = V1Dataset(str(p), mode="train", task="classification")
        assert ds[0]["label"] == 1

    def test_dict_spec_with_trec(self, tmp_path):
        (tmp_path / "q.tsv").write_text("q1\tapple query\n")
        (tmp_path / "d.tsv").write_text("d1\tapple doc\nd2\tbanana doc\n")
        (tmp_path / "qrels").write_text("q1 0 d1 2\n")
        (tmp_path / "run.trec").write_text("q1 Q0 d1 1 9.0 x\nq1 Q0 d2 2 5.0 x\n")
        ds = V1Dataset(
            {"queries": str(tmp_path / "q.tsv"), "docs": str(tmp_path / "d.tsv"),
             "qrels": str(tmp_path / "qrels"), "trec": str(tmp_path / "run.trec")},
            mode="dev",
        )
        ex = ds[0]
        assert ex["query"] == "apple query"
        assert ex["doc"] == "apple doc"
        assert ex["label"] == 2
        assert ds[1]["label"] == 0  # not in qrels


class TestRankingLosses:
    def test_all_kinds_finite_and_ordered(self):
        pos = jnp.array([2.0, 1.0])
        neg = jnp.array([-1.0, 0.0])
        for kind in ["margin_loss", "CE_loss", "triplet_loss"]:
            good = float(ranking_loss(pos, neg, kind))
            bad = float(ranking_loss(neg, pos, kind))
            assert np.isfinite(good) and good < bad, kind


class TestDictOrStr:
    def test_parses_kv_spec_and_plain_path(self):
        import argparse

        from openmatch_tpu.drivers.common import DictOrStr

        p = argparse.ArgumentParser()
        p.add_argument("-test", action=DictOrStr)
        ns = p.parse_args(["-test", "queries=q.tsv,docs=d.tsv,trec=run.trec"])
        assert ns.test == {"queries": "q.tsv", "docs": "d.tsv", "trec": "run.trec"}
        ns = p.parse_args(["-test", "plain.jsonl"])
        assert ns.test == "plain.jsonl"

    def test_path_with_equals_stays_a_string(self):
        """A plain path containing '=' must NOT take the dict branch
        (it used to become {'/data/run': '3/train.jsonl'} and fail deep
        inside V1Dataset), and a spec value containing '=' survives the
        once-per-part split."""
        import argparse

        from openmatch_tpu.drivers.common import DictOrStr

        p = argparse.ArgumentParser()
        p.add_argument("-test", action=DictOrStr)
        ns = p.parse_args(["-test", "/data/run=3/train.jsonl"])
        assert ns.test == "/data/run=3/train.jsonl"
        # relative path with an identifier-looking prefix before '='
        ns = p.parse_args(["-test", "run=3/train.jsonl"])
        assert ns.test == "run=3/train.jsonl"
        ns = p.parse_args(["-test", "queries=a=b.tsv,docs=d.tsv"])
        assert ns.test == {"queries": "a=b.tsv", "docs": "d.tsv"}

    def test_build_v1_tokenizer_dispatch(self, vocab_file):
        """The shared tokenizer rule (train_v1/inference_v1/gen_feature/
        meta_train): word models get the WordTokenizer; bert without a
        source raises a clear error naming the flags."""
        import types

        import pytest as _pytest

        from openmatch_tpu.drivers.common import build_v1_tokenizer
        from openmatch_tpu.v1.tokenizer import WordTokenizer

        args = types.SimpleNamespace(model="knrm", vocab=vocab_file,
                                     pretrain=None)
        assert isinstance(build_v1_tokenizer(args), WordTokenizer)
        args = types.SimpleNamespace(model="bert", vocab=None, pretrain=None)
        with _pytest.raises(ValueError, match="-vocab or -pretrain"):
            build_v1_tokenizer(args)

    def test_inference_v1_id_spec(self, vocab_file, tmp_path):
        """-test queries=...,docs=...,trec=... joins ids through V1Dataset's
        dict mode (reference inference.py takes DictOrStr datasets)."""
        from openmatch_tpu.drivers import inference_v1, train_v1

        rows = [{"query": "apple fruit", "doc_pos": "apple apple fruit",
                 "doc_neg": "stone rock"} for _ in range(8)]
        train = tmp_path / "train.jsonl"
        train.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        train_v1.main([
            "-model", "knrm", "-train", str(train), "-vocab", vocab_file,
            "-save", str(tmp_path / "ckpt"), "-res", str(tmp_path / "r.trec"),
            "-embed_dim", "8", "-max_query_len", "4", "-max_doc_len", "8",
            "-epoch", "1", "-batch_size", "8", "-lr", "0.01",
        ])
        (tmp_path / "queries.tsv").write_text("q1\tapple fruit\n")
        (tmp_path / "docs.tsv").write_text("d1\tapple apple fruit\nd2\tstone rock\n")
        (tmp_path / "first.trec").write_text(
            "q1 Q0 d1 1 3.5 bm25\nq1 Q0 d2 2 2.5 bm25\n")
        res = tmp_path / "out.trec"
        inference_v1.main([
            "-model", "knrm", "-vocab", vocab_file,
            "-test", f"queries={tmp_path}/queries.tsv,docs={tmp_path}/docs.tsv,"
                     f"trec={tmp_path}/first.trec",
            "-mode", "test", "-checkpoint", str(tmp_path / "ckpt"),
            "-res", str(res), "-embed_dim", "8",
            "-max_query_len", "4", "-max_doc_len", "8",
        ])
        lines = res.read_text().strip().splitlines()
        assert len(lines) == 2
        assert {l.split()[2] for l in lines} == {"d1", "d2"}


class TestEndToEndKNRM:
    def test_train_and_predict(self, vocab_file, mesh8, tmp_path):
        tok = WordTokenizer(vocab=vocab_file, if_swr=False, if_stem=False)
        rows = []
        fruits = ["apple", "banana", "cherry", "grape"]
        for i in range(8):
            f = fruits[i % 4]
            rows.append({"query": f"{f} fruit", "doc_pos": f"{f} {f} fruit",
                         "doc_neg": "stone rock"})
        train_path = tmp_path / "train.jsonl"
        train_path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

        model = KNRM(vocab_size=tok.get_vocab_size(), embed_dim=16)
        q = jnp.zeros((1, 4), jnp.int32)
        qm = jnp.ones((1, 4), jnp.float32)
        d = jnp.zeros((1, 8), jnp.int32)
        dm = jnp.ones((1, 8), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), q, qm, d, dm)["params"]

        def score_fn(p, batch):
            s, _ = model.apply({"params": p}, batch["query_idx"], batch["query_mask"],
                               batch["doc_idx"], batch["doc_mask"])
            return s

        ds = V1Dataset(str(train_path), mode="train", task="ranking")
        collator = WordCollator(tok, query_max_len=4, doc_max_len=8, mode="train")
        args = TrainingArguments(learning_rate=0.05, warmup_ratio=0.0,
                                 logging_steps=1000, save_steps=0)
        trainer = V1Trainer(score_fn, params, args, total_steps=30,
                            ranking_loss_kind="triplet_loss", mesh=mesh8)

        def data():
            for _ in range(30):
                yield from batched(iter(ds), 8, collator, drop_last=True)

        first = float(trainer.train_step(next(data())))
        for batch in data():
            if int(trainer.state.step) >= 20:
                break
            trainer.train_step(batch)

        # dev prediction path: positive docs must outscore negatives
        dev_rows = [
            {"label": 1, "query_id": "q1", "doc_id": "dp", "retrieval_score": 1.0,
             "query": "apple fruit", "doc": "apple apple fruit"},
            {"label": 0, "query_id": "q1", "doc_id": "dn", "retrieval_score": 0.5,
             "query": "apple fruit", "doc": "stone rock"},
        ]
        dev_path = tmp_path / "dev.jsonl"
        dev_path.write_text("\n".join(json.dumps(r) for r in dev_rows) + "\n")
        dev = V1Dataset(str(dev_path), mode="dev")
        dev_coll = WordCollator(tok, query_max_len=4, doc_max_len=8, mode="dev")
        result = predict_scores(score_fn, jax.device_get(trainer.state.params),
                                batched(iter(dev), 2, dev_coll))
        assert result["q1"]["dp"] > result["q1"]["dn"]
