"""Tensor-parallel param sharding: spec mapping, placement, and train-step
parity with the replicated run (SURVEY.md §2d TP row; the reference has no
TP — this is the TPU-native extension)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from openmatch_tpu.config import TrainingArguments
from openmatch_tpu.models.bert import BertConfig
from openmatch_tpu.models.dr_model import DRModel
from openmatch_tpu.parallel.mesh import make_mesh
from openmatch_tpu.parallel.tp import param_partition_specs, place_params, validate_tp
from openmatch_tpu.train.dr_trainer import DRTrainer


def tp_model():
    cfg = BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=32,
        max_position_embeddings=32, add_pooler=False,
    )
    model = DRModel(encoder_config=cfg, tied=True, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def make_batch(rng, n_q=16, n_psg=2, s=8):
    q_ids = rng.randint(1, 64, size=(n_q, s)).astype(np.int32)
    p_ids = rng.randint(1, 64, size=(n_q * n_psg, s)).astype(np.int32)
    return {
        "query": {"input_ids": jnp.array(q_ids), "attention_mask": jnp.ones_like(jnp.array(q_ids))},
        "passage": {"input_ids": jnp.array(p_ids), "attention_mask": jnp.ones_like(jnp.array(p_ids))},
    }


class TestSpecs:
    def test_bert_spec_mapping(self):
        _, params = tp_model()
        specs = param_partition_specs(params)
        enc = specs["encoder_q"]
        layer = enc["layer_0"]
        assert layer["attention"]["qkv"]["kernel"] == P(None, None, "model", None)
        assert layer["attention"]["qkv"]["bias"] == P(None, "model", None)
        assert layer["attention"]["out"]["kernel"] == P("model", None, None)
        assert layer["attention"]["out"]["bias"] == P()
        assert layer["intermediate"]["kernel"] == P(None, "model")
        assert layer["intermediate"]["bias"] == P("model")
        assert layer["output"]["kernel"] == P("model", None)
        assert layer["output"]["bias"] == P()
        assert enc["word_embeddings"]["embedding"] == P()
        assert enc["embeddings_ln"]["scale"] == P()

    def test_t5_spec_mapping(self):
        from openmatch_tpu.models.t5 import T5Config, T5Encoder

        cfg = T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32,
                       num_layers=1, num_heads=4)
        enc = T5Encoder(cfg)
        params = enc.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))["params"]
        specs = param_partition_specs(params)
        flat = jax.tree_util.tree_leaves_with_path(specs)
        by_name = {"/".join(str(getattr(p, "key", p)) for p in path): s for path, s in flat}
        q_keys = [k for k in by_name if k.endswith("self_attn/q/kernel")]
        assert q_keys and all(by_name[k] == P(None, "model", None) for k in q_keys)
        o_keys = [k for k in by_name if k.endswith("self_attn/o/kernel")]
        assert o_keys and all(by_name[k] == P("model", None, None) for k in o_keys)
        wi = [k for k in by_name if "/wi" in k and k.endswith("kernel")]
        assert wi and all(by_name[k] == P(None, "model") for k in wi)
        wo = [k for k in by_name if k.endswith("wo/kernel")]
        assert wo and all(by_name[k] == P("model", None) for k in wo)

    def test_validate_rejects_indivisible(self):
        _, params = tp_model()
        specs = param_partition_specs(params)
        with pytest.raises(ValueError, match="does not divide"):
            validate_tp(params, specs, tp_size=3)  # 4 heads, 32 ffn: 3 divides neither


class TestPlacement:
    def test_params_actually_sharded(self):
        mesh = make_mesh(dp_size=4, tp_size=2)
        _, params = tp_model()
        placed = place_params(params, mesh)
        k = placed["encoder_q"]["layer_0"]["intermediate"]["kernel"]
        # [16, 32] column-parallel over tp=2 -> local [16, 16]
        assert {s.data.shape for s in k.addressable_shards} == {(16, 16)}
        emb = placed["encoder_q"]["word_embeddings"]["embedding"]
        assert {s.data.shape for s in emb.addressable_shards} == {emb.shape}

    def test_tp1_mesh_degenerates_to_replication(self, mesh8):
        _, params = tp_model()
        placed = place_params(params, mesh8)
        k = placed["encoder_q"]["layer_0"]["intermediate"]["kernel"]
        assert {s.data.shape for s in k.addressable_shards} == {k.shape}


class TestTPTraining:
    def test_loss_and_update_match_replicated(self):
        """dp=4/tp=2 global-negatives step == dp=8/tp=1 step: same loss,
        same updated params (GSPMD TP is numerically the same computation)."""
        model, params = tp_model()
        rng = np.random.RandomState(0)
        batch = make_batch(rng, n_q=16, n_psg=2)
        args = TrainingArguments(
            learning_rate=1e-2, warmup_ratio=0.0, logging_steps=100,
            save_steps=0, negatives_x_device=True, max_grad_norm=0.0,
        )

        t_rep = DRTrainer(model, params, args, total_steps=2,
                          mesh=make_mesh(dp_size=8, tp_size=1))
        t_tp = DRTrainer(model, params, args, total_steps=2,
                         mesh=make_mesh(dp_size=4, tp_size=2))
        loss_rep = float(t_rep.train_step(batch))
        loss_tp = float(t_tp.train_step(batch))
        assert loss_tp == pytest.approx(loss_rep, rel=1e-5)

        for a, b in zip(
            jax.tree.leaves(jax.device_get(t_rep.state.params)),
            jax.tree.leaves(jax.device_get(t_tp.state.params)),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

        # the TP trainer's params really live sharded over the model axis
        k = t_tp.state.params["encoder_q"]["layer_0"]["intermediate"]["kernel"]
        assert {s.data.shape for s in k.addressable_shards} == {(16, 16)}
        # and so does the optimizer state (inherited via jit propagation)
        mu_leaves = [
            leaf for leaf in jax.tree.leaves(t_tp.state.opt_state)
            if hasattr(leaf, "shape") and leaf.shape == (16, 32)
        ]
        assert mu_leaves and any(
            {s.data.shape for s in leaf.addressable_shards} == {(16, 16)}
            for leaf in mu_leaves
        )

    def test_tp_requires_global_negatives(self):
        model, params = tp_model()
        args = TrainingArguments(negatives_x_device=False, warmup_ratio=0.0)
        with pytest.raises(ValueError, match="tensor parallelism"):
            DRTrainer(model, params, args, total_steps=2,
                      mesh=make_mesh(dp_size=4, tp_size=2))

    def test_tp_grad_cache_matches_plain_tp(self):
        """TP x GradCache (VERDICT r2 weak #6): the chunked two-pass under
        the dp4 x tp2 jit path produces the same loss/updated params as
        the plain TP global-negatives step, and params stay model-sharded."""
        model, params = tp_model()
        rng = np.random.RandomState(1)
        batch = make_batch(rng, n_q=16, n_psg=2)
        base = dict(learning_rate=1e-2, warmup_ratio=0.0, logging_steps=100,
                    save_steps=0, negatives_x_device=True, max_grad_norm=0.0)
        args_plain = TrainingArguments(**base)
        args_gc = TrainingArguments(
            grad_cache=True, per_device_train_batch_size=4,
            gc_q_chunk_size=2, gc_p_chunk_size=4, **base)

        t_plain = DRTrainer(model, params, args_plain, total_steps=2,
                            mesh=make_mesh(dp_size=4, tp_size=2))
        t_gc = DRTrainer(model, params, args_gc, total_steps=2,
                         mesh=make_mesh(dp_size=4, tp_size=2))
        loss_plain = float(t_plain.train_step(batch))
        loss_gc = float(t_gc.train_step(batch))
        assert loss_gc == pytest.approx(loss_plain, rel=1e-5)
        for a, b in zip(
            jax.tree.leaves(jax.device_get(t_plain.state.params)),
            jax.tree.leaves(jax.device_get(t_gc.state.params)),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        k = t_gc.state.params["encoder_q"]["layer_0"]["intermediate"]["kernel"]
        assert {s.data.shape for s in k.addressable_shards} == {(16, 16)}
