"""Numerical parity: our from-scratch Flax BERT encoder vs torch BertModel.

The hub is unreachable in CI, so we build small randomly-initialized torch
models from local transformers config classes, convert their state dicts
with models/hf_convert.py, and require fp32 agreement to ~1e-4.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openmatch_tpu.models.bert import BertConfig, BertEncoder
from openmatch_tpu.models.hf_convert import convert_bert_state_dict
from openmatch_tpu.models.pooling import mean_pooling


def _small_hf_bert(vocab=100, hidden=32, layers=2, heads=4, inter=64, max_pos=64):
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    cfg = HFBertConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=inter,
        max_position_embeddings=max_pos,
        hidden_act="gelu",
    )
    model = BertModel(cfg)
    model.eval()
    return cfg, model


@pytest.fixture(scope="module")
def bert_pair():
    hf_cfg, torch_model = _small_hf_bert()
    config = BertConfig.from_hf_config(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = convert_bert_state_dict(sd, config)
    return config, torch_model, params


def _torch_forward(torch_model, ids, mask):
    import torch

    with torch.no_grad():
        out = torch_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        )
    return out.last_hidden_state.numpy(), out.pooler_output.numpy()


class TestBertParity:
    def test_full_attention(self, bert_pair):
        config, torch_model, params = bert_pair
        rng = np.random.RandomState(0)
        ids = rng.randint(1, 100, size=(3, 10)).astype(np.int64)
        mask = np.ones((3, 10), dtype=np.int64)

        expected, expected_pooled = _torch_forward(torch_model, ids, mask)
        encoder = BertEncoder(config, dtype=jnp.float32)
        got = encoder.apply({"params": params}, jnp.array(ids), jnp.array(mask))
        np.testing.assert_allclose(
            np.asarray(got["last_hidden_state"]), expected, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["pooler_output"]), expected_pooled, atol=2e-4
        )

    def test_padded_attention_mask(self, bert_pair):
        config, torch_model, params = bert_pair
        rng = np.random.RandomState(1)
        ids = rng.randint(1, 100, size=(2, 12)).astype(np.int64)
        mask = np.ones((2, 12), dtype=np.int64)
        mask[0, 8:] = 0
        mask[1, 5:] = 0
        ids = ids * mask  # zero out padded ids like a real collator

        expected, _ = _torch_forward(torch_model, ids, mask)
        encoder = BertEncoder(config, dtype=jnp.float32)
        got = np.asarray(
            encoder.apply({"params": params}, jnp.array(ids), jnp.array(mask))[
                "last_hidden_state"
            ]
        )
        # only compare non-pad positions (pad positions are junk in both)
        for b in range(2):
            n = int(mask[b].sum())
            np.testing.assert_allclose(got[b, :n], expected[b, :n], atol=2e-4)

    def test_mean_pooling_matches_reference_semantics(self, bert_pair):
        config, _, params = bert_pair
        hidden = jnp.array(np.random.RandomState(2).randn(2, 4, 8).astype(np.float32))
        mask = jnp.array([[1, 1, 0, 0], [1, 1, 1, 1]])
        got = np.asarray(mean_pooling(hidden, mask))
        h = np.asarray(hidden)
        np.testing.assert_allclose(got[0], h[0, :2].mean(axis=0), rtol=1e-5)
        np.testing.assert_allclose(got[1], h[1].mean(axis=0), rtol=1e-5)


class TestDropout:
    """HF-config dropout semantics (reference trains through stock
    AutoModel checkpoints with ~0.1 dropout, dense_retrieval_model.py:173):
    eval mode stays pinned to torch regardless of configured rates (the
    parity tests above already run under the HF default 0.1), train mode
    is stochastic-but-reproducible, and 0.0 rates bit-reproduce the
    dropout-free graph even in train mode."""

    def test_config_carries_hf_rates(self, bert_pair):
        config, _, _ = bert_pair
        assert config.hidden_dropout_prob == 0.1
        assert config.attention_probs_dropout_prob == 0.1

    def test_train_mode_stochastic_reproducible(self, bert_pair):
        import jax

        config, _, params = bert_pair
        enc = BertEncoder(config)
        rng = np.random.RandomState(3)
        ids = jnp.asarray(rng.randint(1, 100, size=(2, 6)), jnp.int32)
        mask = jnp.ones_like(ids)
        eval_out = enc.apply({"params": params}, ids, mask)["last_hidden_state"]
        key = jax.random.PRNGKey(0)
        t1 = enc.apply({"params": params}, ids, mask, deterministic=False,
                       rngs={"dropout": key})["last_hidden_state"]
        t2 = enc.apply({"params": params}, ids, mask, deterministic=False,
                       rngs={"dropout": key})["last_hidden_state"]
        t3 = enc.apply({"params": params}, ids, mask, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})["last_hidden_state"]
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        assert np.abs(np.asarray(t1) - np.asarray(eval_out)).max() > 1e-4
        assert np.abs(np.asarray(t1) - np.asarray(t3)).max() > 1e-6

    def test_zero_rate_train_mode_bitexact(self, bert_pair):
        import dataclasses

        import jax

        config, _, params = bert_pair
        cfg0 = dataclasses.replace(config, hidden_dropout_prob=0.0,
                                   attention_probs_dropout_prob=0.0)
        enc = BertEncoder(cfg0)
        rng = np.random.RandomState(4)
        ids = jnp.asarray(rng.randint(1, 100, size=(2, 6)), jnp.int32)
        mask = jnp.ones_like(ids)
        eval_out = enc.apply({"params": params}, ids, mask)["last_hidden_state"]
        train_out = enc.apply(
            {"params": params}, ids, mask, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)})["last_hidden_state"]
        np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(train_out))


class TestElectraParity:
    """ELECTRA rides the BERT layout with one twist: embeddings may live
    at a smaller dim and project up via ``embeddings_project`` (reference
    reaches it through AutoModel, v1/OpenMatch/models/bert.py:30-39; the
    published best base/large rerank rows are ELECTRA,
    v1/README.md:162-165)."""

    @pytest.fixture(scope="class")
    def electra_pair(self):
        import torch
        from transformers import ElectraConfig as HFElectraConfig, ElectraModel

        torch.manual_seed(0)
        # electra-small geometry: embedding_size != hidden_size exercises
        # the embeddings_project mapping
        hf_cfg = HFElectraConfig(
            vocab_size=100,
            embedding_size=16,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=64,
        )
        torch_model = ElectraModel(hf_cfg)
        torch_model.eval()
        config = BertConfig.from_hf_config(hf_cfg)
        sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
        params = convert_bert_state_dict(sd, config)
        return config, torch_model, params

    def test_config_geometry(self, electra_pair):
        config, _, params = electra_pair
        assert config.embedding_size == 16
        assert config.position_offset == 0
        assert "embeddings_project" in params
        assert params["embeddings_project"]["kernel"].shape == (16, 32)

    def test_electra_parity(self, electra_pair):
        config, torch_model, params = electra_pair
        import torch

        rng = np.random.RandomState(0)
        ids = rng.randint(1, 100, size=(2, 11)).astype(np.int64)
        mask = np.ones((2, 11), dtype=np.int64)
        mask[1, 7:] = 0
        ids = ids * mask

        with torch.no_grad():
            expected = (
                torch_model(
                    input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
                )
                .last_hidden_state.numpy()
            )
        encoder = BertEncoder(config, dtype=jnp.float32)
        got = np.asarray(
            encoder.apply({"params": params}, jnp.array(ids), jnp.array(mask))[
                "last_hidden_state"
            ]
        )
        for b in range(2):
            n = int(mask[b].sum())
            np.testing.assert_allclose(got[b, :n], expected[b, :n], atol=2e-4)

    def test_same_dim_electra_has_no_projection(self):
        """embedding_size == hidden_size checkpoints (electra-large layout)
        must convert without a projection layer."""
        import torch
        from transformers import ElectraConfig as HFElectraConfig, ElectraModel

        torch.manual_seed(1)
        hf_cfg = HFElectraConfig(
            vocab_size=80, embedding_size=32, hidden_size=32,
            num_hidden_layers=1, num_attention_heads=4,
            intermediate_size=64, max_position_embeddings=32,
        )
        torch_model = ElectraModel(hf_cfg)
        torch_model.eval()
        config = BertConfig.from_hf_config(hf_cfg)
        assert config.embedding_size is None
        sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
        params = convert_bert_state_dict(sd, config)
        assert "embeddings_project" not in params

        ids = np.arange(1, 9, dtype=np.int64)[None, :]
        mask = np.ones_like(ids)
        with torch.no_grad():
            expected = torch_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        got = np.asarray(
            BertEncoder(config, dtype=jnp.float32).apply(
                {"params": params}, jnp.array(ids), jnp.array(mask)
            )["last_hidden_state"]
        )
        np.testing.assert_allclose(got, expected, atol=2e-4)


class TestRobertaParity:
    def test_roberta_positions(self):
        import torch
        from transformers import RobertaConfig as HFRobertaConfig, RobertaModel

        torch.manual_seed(0)
        hf_cfg = HFRobertaConfig(
            vocab_size=120,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=66,
            pad_token_id=1,
        )
        torch_model = RobertaModel(hf_cfg)
        torch_model.eval()

        config = BertConfig.from_hf_config(hf_cfg)
        assert config.position_offset == 2
        sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
        params = convert_bert_state_dict(sd, config)

        rng = np.random.RandomState(0)
        ids = rng.randint(3, 120, size=(2, 9)).astype(np.int64)
        mask = np.ones((2, 9), dtype=np.int64)
        mask[1, 6:] = 0
        ids = np.where(mask > 0, ids, hf_cfg.pad_token_id)

        with torch.no_grad():
            expected = (
                torch_model(
                    input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
                )
                .last_hidden_state.numpy()
            )
        encoder = BertEncoder(config, dtype=jnp.float32)
        got = np.asarray(
            encoder.apply({"params": params}, jnp.array(ids), jnp.array(mask))[
                "last_hidden_state"
            ]
        )
        for b in range(2):
            n = int(mask[b].sum())
            np.testing.assert_allclose(got[b, :n], expected[b, :n], atol=2e-4)
