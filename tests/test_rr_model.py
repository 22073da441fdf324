"""RRModel: scoring shapes, losses, monoT5 path, persistence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.config import ModelArguments, TrainingArguments
from openmatch_tpu.models.bert import BertConfig
from openmatch_tpu.models.rr_model import RRModel


def _tiny_bert_cfg():
    return BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, add_pooler=False,
    )


def _batch(seed=0, b=4, s=12):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, 64, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), dtype=np.int32)
    return {"input_ids": jnp.array(ids), "attention_mask": jnp.array(mask)}


class TestBertReranker:
    def setup_method(self):
        self.model = RRModel(encoder_config=_tiny_bert_cfg(), head_in_dim=16)
        self.params = self.model.init_params(jax.random.PRNGKey(0))

    def test_score_shape(self):
        s = self.model.score(self.params, **_batch())
        assert s.shape == (4, 1)

    def test_loss_all_registry(self):
        pos, neg = _batch(1), _batch(2)
        for name in ["mr", "smr", "bce"]:
            self.model.loss_fn_str = name
            loss, (ps, ns) = self.model.loss(self.params, pos, neg)
            assert np.isfinite(float(loss))

    def test_relevance_passthrough(self):
        s = jnp.array([[1.5], [2.5]])
        np.testing.assert_allclose(np.asarray(self.model.relevance_logprob(s)), [1.5, 2.5])

    def test_pad_extension_invariance(self):
        """Widening the pad target (device_pair_len rounds the pair
        length up to a 128 multiple for MXU tile alignment) must not
        change scores: pad positions are mask-excluded."""
        from openmatch_tpu.retriever.reranker import device_pair_len

        assert device_pair_len(162) == 256
        assert device_pair_len(128) == 128
        assert device_pair_len(129) == 256
        # widening is capped at the encoder's absolute-position capacity
        # (position ids past the table gather NaN fill rows)
        assert device_pair_len(162, max_positions=512) == 256
        assert device_pair_len(162, max_positions=192) == 162
        assert device_pair_len(16, max_positions=32) == 16
        b = _batch(s=12)
        s0 = self.model.score(self.params, **b)
        wide = {
            "input_ids": jnp.pad(b["input_ids"], ((0, 0), (0, 20))),
            "attention_mask": jnp.pad(b["attention_mask"], ((0, 0), (0, 20))),
        }
        s1 = self.model.score(self.params, **wide)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-5, atol=1e-6)

    def test_save_load(self, tmp_path):
        batch = _batch(3)
        before = np.asarray(self.model.score(self.params, **batch))
        self.model.save(self.params, str(tmp_path / "rr"))
        model2, params2 = RRModel.load(str(tmp_path / "rr"))
        after = np.asarray(model2.score(params2, **batch))
        np.testing.assert_allclose(after, before, atol=1e-5)


class TestMonoT5Reranker:
    def setup_method(self):
        from openmatch_tpu.models.t5 import T5Config

        cfg = T5Config(
            vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=1,
            num_decoder_layers=1, num_heads=4,
            relative_attention_num_buckets=8, relative_attention_max_distance=20,
        )
        self.model = RRModel(
            encoder_config=cfg, backbone_type="t5",
            pos_token_id=5, neg_token_id=7, head_in_dim=16,
        )
        self.params = self.model.init_params(jax.random.PRNGKey(0))

    def test_two_token_scores(self):
        s = self.model.score(self.params, **_batch())
        assert s.shape == (4, 2)

    def test_loss_forced_ce(self):
        assert self.model.loss_fn_str == "ce"
        loss, _ = self.model.loss(self.params, _batch(1), _batch(2))
        assert np.isfinite(float(loss))

    def test_relevance_logsoftmax(self):
        s = jnp.array([[0.0, 0.0]])
        out = np.asarray(self.model.relevance_logprob(s))
        np.testing.assert_allclose(out, [np.log(0.5)], rtol=1e-5)


def test_build_from_hf_dir(tmp_path):
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    model = BertModel(HFBertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32, max_position_embeddings=32))
    model.save_pretrained(str(tmp_path / "hf"))

    args = ModelArguments(model_name_or_path=str(tmp_path / "hf"), dtype="float32",
                          projection_in_dim=16)
    train_args = TrainingArguments(loss_fn="mr", margin=0.5)
    rr, params = RRModel.build(args, train_args)
    assert rr.loss_fn_str == "mr" and rr.margin == 0.5
    s = rr.score(params, **_batch())
    assert s.shape == (4, 1)


class TestLengthBucketedRerank:
    """Bucketed batching (Reranker.bucket_lens) must be invisible in the
    scores: each pair lands in the smallest 128-aligned graph that fits
    it, and results equal per-pair direct scoring at the raw length."""

    def test_mixed_length_run_matches_direct(self, tmp_path):
        from transformers import BertTokenizerFast

        from openmatch_tpu.config import DataArguments, InferenceArguments
        from openmatch_tpu.retriever.reranker import Reranker, encode_pair

        words = [f"w{i}" for i in range(16)]
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
        (tmp_path / "vocab.txt").write_text("\n".join(vocab))
        tok = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))

        cfg = BertConfig(
            vocab_size=32, hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=512, add_pooler=False,
        )
        model = RRModel(encoder_config=cfg, head_in_dim=16)
        params = model.init_params(jax.random.PRNGKey(0))

        data_args = DataArguments(q_max_len=62, p_max_len=190,
                                  doc_template="<text>")
        infer_args = InferenceArguments(per_device_eval_batch_size=2)
        rr = Reranker(model, params, tok, data_args, infer_args)
        assert rr.device_len == 256 and rr.bucket_lens == [128, 256]

        rng = np.random.RandomState(3)
        queries = {"q0": {"text": "w0 w1 w2"}}
        corpus, run = {}, {"q0": {}}
        for i, n_words in enumerate([5, 200, 8, 150, 30]):  # mixed buckets
            text = " ".join(words[rng.randint(0, 16)] for _ in range(n_words))
            corpus[f"d{i}"] = {"text": text}
            run["q0"][f"d{i}"] = float(10 - i)

        result = rr.rerank(queries, corpus, run)
        assert set(result["q0"]) == set(run["q0"])
        for did, doc in corpus.items():
            ids, segs = encode_pair(tok, queries["q0"]["text"], doc["text"],
                                    rr.max_len)
            direct = model.relevance_logprob(model.score(
                params,
                jnp.asarray([ids], jnp.int32),
                jnp.ones((1, len(ids)), jnp.int32),
                jnp.asarray([list(segs)], jnp.int32),
            ))
            assert result["q0"][did] == pytest.approx(
                float(np.asarray(direct)[0]), rel=1e-4, abs=1e-5)
