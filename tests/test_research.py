"""Research recipes: MLM masking/loss, meta-reweighting, ReInfoSelect."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from openmatch_tpu.models.bert import BertConfig
from openmatch_tpu.research.meta_ltr import make_meta_train_step, meta_reweight_step
from openmatch_tpu.research.mlm import MLMModel, mask_tokens, mlm_logits, mlm_loss
from openmatch_tpu.research.reinfoselect import (
    DataSelectionPolicy,
    policy_loss,
    sample_actions,
)


class TestMLM:
    def test_mask_tokens_stats(self):
        rng = jax.random.PRNGKey(0)
        ids = jnp.array(np.random.RandomState(0).randint(5, 100, size=(8, 64)))
        mask = jnp.ones_like(ids)
        masked, labels = mask_tokens(rng, ids, mask, mask_token_id=4,
                                     vocab_size=100, special_ids=(0, 1, 2, 3))
        selected = np.asarray(labels != -100)
        frac = selected.mean()
        assert 0.05 < frac < 0.30  # ~15%
        # where not selected, ids unchanged
        np.testing.assert_array_equal(
            np.asarray(masked)[~selected], np.asarray(ids)[~selected]
        )
        # most selected become [MASK]
        mask_frac = (np.asarray(masked)[selected] == 4).mean()
        assert 0.6 < mask_frac < 0.95

    def test_special_tokens_never_masked(self):
        rng = jax.random.PRNGKey(1)
        ids = jnp.full((4, 16), 2, jnp.int32)  # all [CLS]-ish
        mask = jnp.ones_like(ids)
        _, labels = mask_tokens(rng, ids, mask, 4, 100, special_ids=(2,))
        assert (np.asarray(labels) == -100).all()

    def test_mlm_loss_ignores_unselected(self):
        logits = jnp.zeros((1, 3, 5))
        labels = jnp.array([[-100, 2, -100]])
        loss = mlm_loss(logits, labels)
        assert float(loss) == pytest.approx(np.log(5), rel=1e-5)

    def test_model_forward_and_tied_decode(self):
        cfg = BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=16, add_pooler=False)
        model = MLMModel(cfg)
        ids = jnp.zeros((2, 8), jnp.int32)
        mask = jnp.ones((2, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
        logits = mlm_logits(model, params, ids, mask)
        assert logits.shape == (2, 8, 50)

        # gradient flows into the embedding through the tied decoder
        def loss(p):
            lg = mlm_logits(model, p, ids, mask)
            return mlm_loss(lg, jnp.full((2, 8), 7))

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["bert"]["word_embeddings"]["embedding"]).sum()) > 0


class TestMetaReweight:
    def test_upweights_helpful_examples(self):
        """Linear regression: 2 train examples, one with flipped label.
        The clean example must get (almost) all the weight."""
        w_true = jnp.array([1.0, -2.0])
        # both train examples share x with dev points; one has a flipped label,
        # so its virtual step provably moves dev loss the wrong way
        x_train = jnp.array([[0.5, 1.0], [0.5, 1.0]])
        y_train = jnp.array([float(x_train[0] @ w_true), float(-(x_train[1] @ w_true))])
        x_dev = jnp.array([[0.5, 1.0], [1.0, 1.0], [0.2, 0.7]])
        y_dev = x_dev @ w_true

        params = {"w": jnp.zeros(2)}

        def per_example(p, batch):
            x, y = batch
            return (x @ p["w"] - y) ** 2

        def dev_loss(p, batch):
            x, y = batch
            return ((x @ p["w"] - y) ** 2).mean()

        weights, _ = meta_reweight_step(
            params, per_example, dev_loss, (x_train, y_train), (x_dev, y_dev),
            virtual_lr=0.1,
        )
        weights = np.asarray(weights)
        assert weights[0] > 0.9  # clean example dominates
        assert weights[1] < 0.1

    def test_meta_train_step_converges(self):
        from openmatch_tpu.train.state import TrainState

        w_true = jnp.array([2.0, -1.0])
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(16, 2).astype(np.float32))
        y_clean = x @ w_true
        y = y_clean.at[:4].set(-y_clean[:4])  # 25% corrupted
        x_dev = jnp.asarray(rng.randn(8, 2).astype(np.float32))
        y_dev = x_dev @ w_true

        def per_example(p, batch):
            bx, by = batch
            return (bx @ p["w"] - by) ** 2

        def dev_loss(p, batch):
            bx, by = batch
            return ((bx @ p["w"] - by) ** 2).mean()

        tx = optax.sgd(0.02)
        state = TrainState.create({"w": jnp.zeros(2)}, tx)
        step = make_meta_train_step(per_example, dev_loss, virtual_lr=0.02)
        for _ in range(500):
            state, loss, weights = step(state, (x, y), (x_dev, y_dev))
        final_dev = float(dev_loss(state.params, (x_dev, y_dev)))
        assert final_dev < 0.05  # corrupted examples were suppressed
        # corrupted rows got low average weight
        w = np.asarray(weights)
        assert w[:4].mean() < w[4:].mean()


class TestReInfoSelect:
    def test_policy_shapes_and_reinforce_direction(self):
        policy = DataSelectionPolicy(hidden_dim=8)
        feats = jnp.asarray(np.random.RandomState(0).randn(6, 4).astype(np.float32))
        params = policy.init(jax.random.PRNGKey(0), feats)["params"]
        log_probs = policy.apply({"params": params}, feats)
        assert log_probs.shape == (6, 2)
        actions = sample_actions(jax.random.PRNGKey(1), log_probs)
        assert set(np.asarray(actions).tolist()) <= {0, 1}

        # positive reward increases chosen-action log-prob after a grad step
        def loss_fn(p):
            lp = policy.apply({"params": p}, feats)
            return policy_loss(lp, actions, jnp.asarray(1.0))

        grads = jax.grad(loss_fn)(params)
        new_params = jax.tree.map(lambda p, g: p - 0.1 * g, params, grads)
        before = policy.apply({"params": params}, feats)
        after = policy.apply({"params": new_params}, feats)
        chosen_before = np.take_along_axis(np.asarray(before), np.asarray(actions)[:, None], 1)
        chosen_after = np.take_along_axis(np.asarray(after), np.asarray(actions)[:, None], 1)
        assert chosen_after.sum() > chosen_before.sum()
