"""BertMaxP / EDRM input construction + full forward integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.models.bert import BertConfig
from openmatch_tpu.v1.long_doc import BertMaxPCollator, EDRMCollator, split_doc_tokens
from openmatch_tpu.v1.models import EDRM, BertMaxP
from openmatch_tpu.v1.tokenizer import WordTokenizer


@pytest.fixture(scope="module")
def bert_tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("maxp_tok")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "long", "doc", "words", "query"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"))


class TestSplit:
    def test_windows(self):
        tokens = list(range(100))
        w = split_doc_tokens(tokens, max_doc_len=30, num_passages=4)
        assert [len(x) for x in w] == [30, 30, 30, 10]
        assert w[0][0] == 0 and w[3][0] == 90

    def test_short_doc_empty_windows(self):
        w = split_doc_tokens([1, 2], max_doc_len=10, num_passages=4)
        assert w[0] == [1, 2] and w[1] == [] and w[3] == []


class TestBertMaxPCollator:
    def test_shapes_and_forward(self, bert_tokenizer):
        coll = BertMaxPCollator(bert_tokenizer, max_query_len=4, max_doc_len=6, num_passages=4)
        batch = coll([
            {"query": "query words", "doc": "long doc words " * 10, "label": 1},
            {"query": "query", "doc": "doc", "label": 0},
        ])
        assert batch["input_ids"].shape == (2, 4, 4 + 6 + 3)
        assert batch["input_ids"][0, 0, 0] == bert_tokenizer.cls_token_id
        # segment ids: query part 0, doc part 1
        assert batch["segment_ids"][0, 0, 0] == 0
        # a full first window has doc tokens with segment 1
        assert batch["segment_ids"][0, 0].max() == 1

        cfg = BertConfig(vocab_size=16, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=16, add_pooler=False)
        model = BertMaxP(config=cfg, num_passages=4)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["input_ids"]), jnp.asarray(batch["input_mask"]),
            jnp.asarray(batch["segment_ids"]),
        )["params"]
        score, _ = model.apply(
            {"params": params},
            jnp.asarray(batch["input_ids"]), jnp.asarray(batch["input_mask"]),
            jnp.asarray(batch["segment_ids"]),
        )
        assert score.shape == (2,)
        assert np.isfinite(np.asarray(score)).all()


class TestEDRMCollator:
    def test_shapes_and_forward(self, tmp_path):
        words = ["apple", "fruit", "banana", "rock", "mineral", "stone"]
        (tmp_path / "wv.txt").write_text("\n".join(words))
        (tmp_path / "ev.txt").write_text("\n".join(["APPLE", "ROCK"]))
        wtok = WordTokenizer(vocab=str(tmp_path / "wv.txt"), if_swr=False, if_stem=False)
        etok = WordTokenizer(vocab=str(tmp_path / "ev.txt"), if_swr=False, if_stem=False)

        coll = EDRMCollator(wtok, etok, max_query_len=4, max_doc_len=8,
                            max_ent_num=2, max_des_len=5)
        batch = coll([{
            "query": "apple fruit", "doc": "rock mineral stone",
            "query_ent": ["APPLE"], "doc_ent": ["ROCK"],
            "query_des": ["apple fruit"], "doc_des": ["rock mineral"],
        }])
        assert batch["query_ent_idx"].shape == (1, 2)
        assert batch["query_ent_mask"][0].tolist() == [1.0, 0.0]  # 1 real + 1 pad
        assert batch["query_des_idx"].shape == (1, 2 * 5)

        model = EDRM(wrd_vocab_size=wtok.get_vocab_size(), ent_vocab_size=etok.get_vocab_size(),
                     wrd_embed_dim=8, ent_embed_dim=8, kernel_dim=8, kernel_sizes=(1, 2),
                     max_des_len=5, max_ent_num=2)
        args = tuple(jnp.asarray(batch[k]) for k in (
            "query_wrd_idx", "query_wrd_mask", "doc_wrd_idx", "doc_wrd_mask",
            "query_ent_idx", "query_ent_mask", "doc_ent_idx", "doc_ent_mask",
            "query_des_idx", "doc_des_idx"))
        params = model.init(jax.random.PRNGKey(0), *args)["params"]
        score, logits = model.apply({"params": params}, *args)
        assert score.shape == (1,)
        assert np.isfinite(np.asarray(score)).all()

    def test_train_collate_pos_neg(self, tmp_path):
        """Train-ranking mode emits doc_pos_*/doc_neg_* tensors that the
        trainer's pos/neg split maps back onto the model's doc_* inputs
        (reference v1/train.py:299-311 edrm branch)."""
        (tmp_path / "wv.txt").write_text("\n".join(["apple", "fruit", "rock"]))
        (tmp_path / "ev.txt").write_text("APPLE\nROCK")
        wtok = WordTokenizer(vocab=str(tmp_path / "wv.txt"), if_swr=False, if_stem=False)
        etok = WordTokenizer(vocab=str(tmp_path / "ev.txt"), if_swr=False, if_stem=False)
        coll = EDRMCollator(wtok, etok, max_query_len=4, max_doc_len=8,
                            max_ent_num=2, max_des_len=5, mode="train", task="ranking")
        batch = coll([{
            "query": "apple", "doc_pos": "apple fruit", "doc_neg": "rock",
            "query_ent": ["APPLE"], "doc_pos_ent": ["APPLE"], "doc_neg_ent": ["ROCK"],
            "query_des": ["apple fruit"], "doc_pos_des": ["apple"], "doc_neg_des": ["rock"],
        }])
        from openmatch_tpu.train.v1_trainer import _default_pos_neg_split

        pos, neg = _default_pos_neg_split(batch)
        for key in ("doc_wrd_idx", "doc_wrd_mask", "doc_ent_idx",
                    "doc_ent_mask", "doc_des_idx", "query_wrd_idx"):
            assert key in pos and key in neg, key
        assert pos["doc_ent_idx"][0, 0] == etok._token2id["APPLE"]
        assert neg["doc_ent_idx"][0, 0] == etok._token2id["ROCK"]


class TestEDRMEndToEnd:
    def test_train_and_inference_drivers(self, tmp_path):
        """-model edrm from an entities jsonl through a trained checkpoint
        to a TREC run (VERDICT r1 item 5; reference v1/train.py edrm path)."""
        import json

        from openmatch_tpu.drivers import inference_v1, train_v1

        (tmp_path / "wv.txt").write_text("\n".join(
            ["apple", "fruit", "banana", "rock", "mineral", "stone"]))
        (tmp_path / "ev.txt").write_text("APPLE\nROCK")
        train_lines = []
        for _ in range(8):
            train_lines.append(json.dumps({
                "query": "apple fruit", "doc_pos": "apple banana fruit",
                "doc_neg": "rock mineral stone",
                "query_ent": ["APPLE"], "doc_pos_ent": ["APPLE"],
                "doc_neg_ent": ["ROCK"],
                "query_des": ["apple fruit"], "doc_pos_des": ["banana fruit"],
                "doc_neg_des": ["rock stone"],
            }))
        (tmp_path / "train.jsonl").write_text("\n".join(train_lines))
        dev_lines = []
        for did, doc, ents in (("d1", "apple banana fruit", ["APPLE"]),
                               ("d2", "rock mineral stone", ["ROCK"])):
            dev_lines.append(json.dumps({
                "query": "apple fruit", "doc": doc, "label": 1 if did == "d1" else 0,
                "query_id": "q1", "doc_id": did, "retrieval_score": 1.0,
                "query_ent": ["APPLE"], "doc_ent": ents,
                "query_des": ["apple fruit"], "doc_des": ["x"],
            }))
        (tmp_path / "dev.jsonl").write_text("\n".join(dev_lines))
        (tmp_path / "qrels").write_text("q1 0 d1 1\n")

        save = tmp_path / "ckpt"
        res = tmp_path / "run.trec"
        common = [
            "-model", "edrm", "-vocab", str(tmp_path / "wv.txt"),
            "-ent_vocab", str(tmp_path / "ev.txt"),
            "-max_query_len", "4", "-max_doc_len", "8",
            "-max_ent_num", "2", "-max_des_len", "5", "-kernel_dim", "8",
            "-embed_dim", "8",
        ]
        train_v1.main(common + [
            "-train", str(tmp_path / "train.jsonl"),
            "-dev", str(tmp_path / "dev.jsonl"), "-qrels", str(tmp_path / "qrels"),
            "-save", str(save), "-res", str(res),
            "-epoch", "2", "-batch_size", "8", "-lr", "1e-3", "-eval_every", "100",
        ])
        assert (save / "train_state.msgpack").exists()
        assert res.exists() and res.read_text().strip()

        res2 = tmp_path / "run2.trec"
        inference_v1.main(common + [
            "-test", str(tmp_path / "dev.jsonl"), "-mode", "dev",
            "-checkpoint", str(save), "-res", str(res2),
        ])
        lines = res2.read_text().strip().splitlines()
        assert len(lines) == 2 and all("q1" in ln for ln in lines)
