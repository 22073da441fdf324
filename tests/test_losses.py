"""Loss semantics golden tests vs. hand-computed / torch-reference values."""

import numpy as np
import pytest

import jax.numpy as jnp

from openmatch_tpu import losses as L


def softmax_ce(scores, target):
    """numpy reference cross-entropy."""
    scores = np.asarray(scores, dtype=np.float64)
    s = scores - scores.max(axis=-1, keepdims=True)
    logp = s - np.log(np.exp(s).sum(axis=-1, keepdims=True))
    return -logp[np.arange(len(target)), target].mean()


class TestContrastive:
    def test_targets_stride(self):
        # 4 queries, 8 passages -> positives at columns 0,2,4,6
        t = L.contrastive_targets(4, 8)
        np.testing.assert_array_equal(np.asarray(t), [0, 2, 4, 6])

    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        q = rng.randn(4, 16).astype(np.float32)
        p = rng.randn(8, 16).astype(np.float32)
        loss = L.simple_contrastive_loss(jnp.array(q), jnp.array(p))
        expected = softmax_ce(q @ p.T, [0, 2, 4, 6])
        assert float(loss) == pytest.approx(expected, rel=1e-5)

    def test_reduction_sum(self):
        rng = np.random.RandomState(1)
        q = rng.randn(2, 8).astype(np.float32)
        p = rng.randn(4, 8).astype(np.float32)
        mean = L.simple_contrastive_loss(jnp.array(q), jnp.array(p), reduction="mean")
        total = L.simple_contrastive_loss(jnp.array(q), jnp.array(p), reduction="sum")
        assert float(total) == pytest.approx(2 * float(mean), rel=1e-6)

    def test_with_scores(self):
        rng = np.random.RandomState(2)
        q = rng.randn(2, 8).astype(np.float32)
        p = rng.randn(6, 8).astype(np.float32)
        loss, scores = L.contrastive_loss_with_scores(jnp.array(q), jnp.array(p))
        assert scores.shape == (2, 6)
        np.testing.assert_allclose(np.asarray(scores), q @ p.T, rtol=1e-5)


class TestPairwise:
    def test_margin_ranking(self):
        pos = jnp.array([2.0, 0.0])
        neg = jnp.array([0.0, 2.0])
        # relu(1 - 2 + 0)=0, relu(1 - 0 + 2)=3 -> mean 1.5
        assert float(L.margin_ranking_loss(pos, neg, margin=1.0)) == pytest.approx(1.5)

    def test_soft_margin(self):
        pos = jnp.array([1.0])
        neg = jnp.array([0.0])
        expected = np.log1p(np.exp(1.0 - 1.0 + 0.0))
        assert float(L.soft_margin_ranking_loss(pos, neg, margin=1.0)) == pytest.approx(
            expected, rel=1e-5
        )

    def test_bce(self):
        pos = jnp.array([0.0])
        neg = jnp.array([0.0])
        # -log(sigmoid(0)) + -log(1-sigmoid(0)) = 2 * log 2
        assert float(L.binary_cross_entropy_loss(pos, neg)) == pytest.approx(
            2 * np.log(2), rel=1e-5
        )

    def test_ce_two_class(self):
        pos = jnp.array([[0.0, 0.0]])  # [neg_logit, pos_logit]
        neg = jnp.array([[0.0, 0.0]])
        assert float(L.cross_entropy_loss(pos, neg)) == pytest.approx(
            2 * np.log(2), rel=1e-5
        )

    def test_registry(self):
        assert set(L.rr_loss_functions) == {"mr", "smr", "bce", "ce"}


class TestDualContrastive:
    def test_reduces_to_simple_plus_weighted_reverse(self):
        from openmatch_tpu.losses import dual_contrastive_loss, simple_contrastive_loss

        rng = np.random.RandomState(3)
        q = rng.randn(4, 8).astype(np.float32)
        p = rng.randn(8, 8).astype(np.float32)  # stride 2
        total = float(dual_contrastive_loss(jnp.array(q), jnp.array(p), dual_weight=0.5))
        q2p = float(simple_contrastive_loss(jnp.array(q), jnp.array(p)))
        pos = p[::2]
        p2q = softmax_ce(pos @ q.T, [0, 1, 2, 3])
        assert total == pytest.approx(q2p + 0.5 * p2q, rel=1e-5)

    def test_trainer_flag(self):
        import jax
        from openmatch_tpu.config import TrainingArguments
        from openmatch_tpu.models.bert import BertConfig
        from openmatch_tpu.models.dr_model import DRModel
        from openmatch_tpu.train.dr_trainer import DRTrainer

        cfg = BertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=16, add_pooler=False)
        model = DRModel(encoder_config=cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.PRNGKey(0))
        args = TrainingArguments(learning_rate=1e-3, warmup_ratio=0.0,
                                 negatives_x_device=True, dual_learning=True,
                                 logging_steps=100, save_steps=0)
        trainer = DRTrainer(model, params, args, total_steps=2)
        rng = np.random.RandomState(0)
        batch = {
            "query": {"input_ids": jnp.array(rng.randint(1, 32, (8, 6)).astype(np.int32)),
                      "attention_mask": jnp.ones((8, 6), jnp.int32)},
            "passage": {"input_ids": jnp.array(rng.randint(1, 32, (16, 6)).astype(np.int32)),
                        "attention_mask": jnp.ones((16, 6), jnp.int32)},
        }
        assert np.isfinite(float(trainer.train_step(batch)))


class TestTemperature:
    def test_scales_logits(self):
        rng = np.random.RandomState(4)
        q = rng.randn(2, 8).astype(np.float32)
        p = rng.randn(4, 8).astype(np.float32)
        cold = L.simple_contrastive_loss(jnp.array(q), jnp.array(p), temperature=0.05)
        expected = softmax_ce((q @ p.T) / 0.05, [0, 2])
        assert float(cold) == pytest.approx(expected, rel=1e-5)
