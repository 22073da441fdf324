"""DRModel: build from a raw HF checkpoint dir, encode, persist, reload."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.config import ModelArguments
from openmatch_tpu.models.dr_model import DRModel


@pytest.fixture(scope="module")
def hf_bert_dir(tmp_path_factory):
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    cfg = HFBertConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
    )
    model = BertModel(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_bert")
    model.save_pretrained(str(d))
    return str(d), model


def _ids(seed=0, b=3, s=10):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, 100, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), dtype=np.int32)
    mask[-1, 6:] = 0
    ids = ids * mask
    return jnp.array(ids), jnp.array(mask)


class TestBuildEncode:
    def test_build_tied(self, hf_bert_dir):
        path, _ = hf_bert_dir
        args = ModelArguments(model_name_or_path=path, dtype="float32")
        model, params = DRModel.build(args)
        assert model.tied and not model.has_head
        ids, mask = _ids()
        q = model.encode_query(params, ids, mask)
        p = model.encode_passage(params, ids, mask)
        np.testing.assert_allclose(np.asarray(q), np.asarray(p))  # tied towers

    def test_matches_torch_cls_pooling(self, hf_bert_dir):
        import torch

        path, torch_model = hf_bert_dir
        args = ModelArguments(model_name_or_path=path, dtype="float32")
        model, params = DRModel.build(args)
        ids, mask = _ids(1)
        got = np.asarray(model.encode_query(params, ids, mask))
        with torch.no_grad():
            expected = torch_model(
                input_ids=torch.tensor(np.asarray(ids)),
                attention_mask=torch.tensor(np.asarray(mask)),
            ).last_hidden_state[:, 0, :].numpy()
        np.testing.assert_allclose(got, expected, atol=2e-4)

    def test_untied_head_normalize(self, hf_bert_dir):
        path, _ = hf_bert_dir
        args = ModelArguments(
            model_name_or_path=path,
            dtype="float32",
            untie_encoder=True,
            add_linear_head=True,
            projection_in_dim=32,
            projection_out_dim=16,
            normalize=True,
            pooling="mean",
        )
        model, params = DRModel.build(args)
        assert not model.tied
        assert "encoder_p" in params and "head_p" in params
        ids, mask = _ids(2)
        q = np.asarray(model.encode_query(params, ids, mask))
        assert q.shape == (3, 16)
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, rtol=1e-5)

    def test_save_load_roundtrip(self, hf_bert_dir, tmp_path):
        path, _ = hf_bert_dir
        args = ModelArguments(
            model_name_or_path=path, dtype="float32", add_linear_head=True,
            projection_in_dim=32, projection_out_dim=32,
        )
        model, params = DRModel.build(args)
        ids, mask = _ids(3)
        before = np.asarray(model.encode_query(params, ids, mask))

        out = tmp_path / "ckpt"
        model.save(params, str(out))
        assert (out / "openmatch_config.json").exists()

        # reload through the build() dispatch (sees openmatch_config.json)
        args2 = ModelArguments(model_name_or_path=str(out), dtype="float32")
        model2, params2 = DRModel.build(args2)
        after = np.asarray(model2.encode_query(params2, ids, mask))
        np.testing.assert_allclose(after, before, atol=1e-5)
        assert model2.has_head == model.has_head
        assert model2.pooling == model.pooling

    def test_init_params_fresh(self):
        from openmatch_tpu.models.bert import BertConfig

        cfg = BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=16, add_pooler=False)
        model = DRModel(encoder_config=cfg, tied=False, has_head=True,
                        head_in_dim=16, head_out_dim=8)
        params = model.init_params(jax.random.PRNGKey(0))
        assert set(params) == {"encoder_q", "encoder_p", "head_q", "head_p"}
        ids = jnp.zeros((2, 4), jnp.int32)
        mask = jnp.ones((2, 4), jnp.int32)
        assert model.encode_query(params, ids, mask).shape == (2, 8)
