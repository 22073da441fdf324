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
