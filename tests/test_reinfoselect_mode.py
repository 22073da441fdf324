"""ReInfoSelect as a runnable training mode (reference v1/train.py:55-265,
-reinfoselect flag at :423): policy selection, masked ranker training,
REINFORCE refresh from the dev-metric delta, and the train_v1 CLI wiring."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.config import TrainingArguments
from openmatch_tpu.data.loader import batched
from openmatch_tpu.research.reinfoselect import (
    gumbel_keep_log_probs,
    make_policy_refresh,
    select_pairs,
)
from openmatch_tpu.train.reinfoselect_trainer import (
    ReInfoSelectTrainer,
    per_pair_ranking_loss,
    policy_inputs_from_batch,
)
from openmatch_tpu.v1.dataset import V1Dataset, WordCollator
from openmatch_tpu.v1.models import KNRM
from openmatch_tpu.v1.tokenizer import WordTokenizer

import optax


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("ris_vocab")
    words = ["apple", "banana", "cherry", "grape", "melon", "fruit", "stone", "rock"]
    (d / "vocab.txt").write_text("\n".join(words))
    return str(d / "vocab.txt")


def _fixture_files(tmp_path, n_train=16):
    fruits = ["apple", "banana", "cherry", "grape"]
    rows = []
    for i in range(n_train):
        f = fruits[i % 4]
        rows.append({"query": f"{f} fruit", "doc_pos": f"{f} {f} fruit",
                     "doc_neg": "stone rock"})
    train = tmp_path / "train.jsonl"
    train.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    dev_rows = [
        {"label": 1, "query_id": "q1", "doc_id": "dp", "retrieval_score": 1.0,
         "query": "apple fruit", "doc": "apple apple fruit"},
        {"label": 0, "query_id": "q1", "doc_id": "dn", "retrieval_score": 0.5,
         "query": "apple fruit", "doc": "stone rock"},
    ]
    dev = tmp_path / "dev.jsonl"
    dev.write_text("\n".join(json.dumps(r) for r in dev_rows) + "\n")
    qrels = tmp_path / "qrels"
    qrels.write_text("q1 0 dp 1\nq1 0 dn 0\n")
    return str(train), str(dev), str(qrels)


class TestPolicyPrimitives:
    def test_per_pair_losses_match_mean_forms(self):
        from openmatch_tpu.train.v1_trainer import ranking_loss

        pos = jnp.asarray([0.5, -0.2, 1.3])
        neg = jnp.asarray([0.1, 0.4, -0.9])
        for kind in ("margin_loss", "CE_loss", "triplet_loss"):
            per = per_pair_ranking_loss(pos, neg, kind)
            assert per.shape == (3,)
            np.testing.assert_allclose(
                float(per.mean()), float(ranking_loss(pos, neg, kind)), rtol=1e-6)

    def test_selection_deterministic_in_rng(self):
        logits = jnp.asarray([[0.2, 0.8], [1.0, -1.0], [0.0, 0.0]])
        a1 = select_pairs(jax.random.PRNGKey(3), logits, tau=1.0)
        a2 = select_pairs(jax.random.PRNGKey(3), logits, tau=1.0)
        assert a1.shape == (3,)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert set(np.asarray(a1).tolist()) <= {0, 1}

    def test_refresh_moves_keep_probability_with_reward_sign(self):
        """Positive reward raises P(keep) of kept pairs; negative reward
        raises the flipped action's probability (train.py:249-254)."""
        w = jnp.asarray([[0.3, -0.2], [0.1, 0.4]])

        def policy_score_fn(params, inputs):
            return inputs["x"] @ params["w"]

        tx = optax.sgd(0.5)
        refresh = make_policy_refresh(policy_score_fn, tx, tau=1.0)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 2), np.float32)
        rngs = jnp.stack([jax.random.PRNGKey(7)])
        # force all-keep actions so the kept mask is non-trivial
        actions = jnp.ones((1, 4), jnp.int32)

        def mean_keep_logp(params):
            logits = policy_score_fn(params, {"x": x[0]})
            g_rng, _ = jax.random.split(jax.random.PRNGKey(7))
            lp = gumbel_keep_log_probs(g_rng, logits, 1.0)
            return float(lp[:, 1].mean())

        p0 = {"w": w}
        opt0 = tx.init(p0)
        before = mean_keep_logp(p0)
        p_pos, _ = refresh(p0, opt0, {"x": x}, rngs, actions, 1.0)
        assert mean_keep_logp(jax.device_get(p_pos)) > before
        p_neg, _ = refresh(p0, opt0, {"x": x}, rngs, actions, -1.0)
        assert mean_keep_logp(jax.device_get(p_neg)) < before

    def test_policy_inputs_mapping(self):
        word = {"query_idx": 1, "query_mask": 2, "doc_pos_idx": 3,
                "doc_pos_mask": 4, "doc_neg_idx": 5, "doc_neg_mask": 6}
        got = policy_inputs_from_batch(word)
        assert got == {"query_idx": 1, "query_mask": 2, "doc_idx": 3, "doc_mask": 4}
        edrm = {"query_wrd_idx": 1, "query_wrd_mask": 2, "doc_pos_wrd_idx": 3,
                "doc_pos_wrd_mask": 4}
        got = policy_inputs_from_batch(edrm)
        assert got["doc_idx"] == 3 and got["query_idx"] == 1
        cls = {"query_idx": 1, "query_mask": 2, "doc_idx": 3, "doc_mask": 4}
        assert policy_inputs_from_batch(cls)["doc_idx"] == 3


class TestTrainerLoop:
    def test_keep_rate_responds_to_reward(self, vocab_file, mesh8, tmp_path):
        """Reward engineered to equal the fraction of pairs kept: REINFORCE
        must drive the policy's keep-rate up across refreshes."""
        tok = WordTokenizer(vocab=vocab_file, if_swr=False, if_stem=False)
        train, dev, qrels = _fixture_files(tmp_path)

        model = KNRM(vocab_size=tok.get_vocab_size(), embed_dim=8)
        q = jnp.zeros((1, 4), jnp.int32)
        qm = jnp.ones((1, 4), jnp.float32)
        d = jnp.zeros((1, 8), jnp.int32)
        dm = jnp.ones((1, 8), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), q, qm, d, dm)["params"]

        policy = KNRM(vocab_size=tok.get_vocab_size(), embed_dim=8,
                      task="classification")
        policy_params = policy.init(jax.random.PRNGKey(1), q, qm, d, dm)["params"]

        def score_fn(p, batch):
            s, _ = model.apply({"params": p}, batch["query_idx"], batch["query_mask"],
                               batch["doc_idx"], batch["doc_mask"])
            return s

        def policy_score_fn(p, inputs):
            s, _ = policy.apply({"params": p}, inputs["query_idx"], inputs["query_mask"],
                                inputs["doc_idx"], inputs["doc_mask"])
            return s

        args = TrainingArguments(
            output_dir=str(tmp_path / "out"), learning_rate=0.3,
            warmup_ratio=0.0, logging_steps=1000, save_steps=0, eval_steps=2,
        )
        trainer = ReInfoSelectTrainer(
            score_fn, params, policy_score_fn, policy_params, args,
            total_steps=40, ranking_loss_kind="triplet_loss", mesh=mesh8,
        )

        # reward = recent keep-rate (a metric the policy directly controls):
        # each refresh's metric delta is positive exactly when keeping more
        def eval_fn(tr):
            if not tr.keep_rates:
                return 0.0
            return float(np.mean(tr.keep_rates[-args.eval_steps:]))

        ds = V1Dataset(train, mode="train", task="ranking")
        collator = WordCollator(tok, query_max_len=4, doc_max_len=8, mode="train")

        def data():
            for _ in range(40):
                yield from batched(iter(ds), 8, collator, drop_last=True)

        out = trainer.train(data(), eval_fn)
        rates = out["keep_rates"]
        assert len(rates) == 40
        first, last = np.mean(rates[:8]), np.mean(rates[-8:])
        assert last > first, (first, last)
        assert last > 0.7  # policy learned that keeping everything pays

    def test_zero_kept_batch_freezes_ranker(self, vocab_file, mesh8, tmp_path):
        """A batch where the policy drops every pair must leave the ranker
        params untouched (the reference `continue`s, train.py:114)."""
        tok = WordTokenizer(vocab=vocab_file, if_swr=False, if_stem=False)
        train, _, _ = _fixture_files(tmp_path)
        model = KNRM(vocab_size=tok.get_vocab_size(), embed_dim=8)
        q = jnp.zeros((1, 4), jnp.int32)
        qm = jnp.ones((1, 4), jnp.float32)
        d = jnp.zeros((1, 8), jnp.int32)
        dm = jnp.ones((1, 8), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), q, qm, d, dm)["params"]

        def score_fn(p, batch):
            s, _ = model.apply({"params": p}, batch["query_idx"], batch["query_mask"],
                               batch["doc_idx"], batch["doc_mask"])
            return s

        def drop_all_policy(p, inputs):
            B = inputs["query_idx"].shape[0]
            # huge drop logit -> gumbel noise cannot flip the sample
            return jnp.tile(jnp.asarray([[1e4, -1e4]]), (B, 1))

        args = TrainingArguments(output_dir=str(tmp_path / "out0"),
                                 learning_rate=0.3, warmup_ratio=0.0,
                                 logging_steps=1000, save_steps=0, eval_steps=None)
        trainer = ReInfoSelectTrainer(
            score_fn, params, drop_all_policy, {"unused": jnp.zeros(1)}, args,
            total_steps=3, ranking_loss_kind="triplet_loss", mesh=mesh8,
        )
        before = jax.device_get(trainer.state.params)
        ds = V1Dataset(train, mode="train", task="ranking")
        collator = WordCollator(tok, query_max_len=4, doc_max_len=8, mode="train")
        trainer.train(batched(iter(ds), 8, collator, drop_last=True),
                      eval_fn=lambda tr: 0.0)
        after = jax.device_get(trainer.state.params)
        assert int(trainer.state.step) == 2  # steps advanced
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), before, after)


    def test_reset_survives_decreasing_dev_metric(self, vocab_file, mesh8,
                                                   tmp_path):
        """-reset restores the best checkpoint when the dev metric drops.
        The jitted step donates the TrainState, so a best_params snapshot
        sharing its buffers points at DELETED arrays one step later —
        this drove a 'Array has been deleted' crash whenever the metric
        failed to improve (the snapshot must copy, and the restore must
        copy again or the next donation deletes the snapshot)."""
        tok = WordTokenizer(vocab=vocab_file, if_swr=False, if_stem=False)
        train, _, _ = _fixture_files(tmp_path)
        model = KNRM(vocab_size=tok.get_vocab_size(), embed_dim=8)
        q = jnp.zeros((1, 4), jnp.int32)
        qm = jnp.ones((1, 4), jnp.float32)
        d = jnp.zeros((1, 8), jnp.int32)
        dm = jnp.ones((1, 8), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), q, qm, d, dm)["params"]
        policy = KNRM(vocab_size=tok.get_vocab_size(), embed_dim=8,
                      task="classification")
        policy_params = policy.init(jax.random.PRNGKey(1), q, qm, d, dm)["params"]

        def score_fn(p, batch):
            s, _ = model.apply({"params": p}, batch["query_idx"],
                               batch["query_mask"], batch["doc_idx"],
                               batch["doc_mask"])
            return s

        def policy_score_fn(p, inputs):
            s, _ = policy.apply({"params": p}, inputs["query_idx"],
                                inputs["query_mask"], inputs["doc_idx"],
                                inputs["doc_mask"])
            return s

        args = TrainingArguments(
            output_dir=str(tmp_path / "outr"), learning_rate=0.3,
            warmup_ratio=0.0, logging_steps=1000, save_steps=0, eval_steps=2,
        )
        trainer = ReInfoSelectTrainer(
            score_fn, params, policy_score_fn, policy_params, args,
            total_steps=10, ranking_loss_kind="triplet_loss", mesh=mesh8,
            reset=True,
        )
        # strictly DECREASING dev metric: every eval takes the reset
        # branch with a best_params snapshot that is never refreshed
        metric = iter(np.linspace(1.0, 0.0, 20))
        ds = V1Dataset(train, mode="train", task="ranking")
        collator = WordCollator(tok, query_max_len=4, doc_max_len=8,
                                mode="train")

        def data():
            for _ in range(10):
                yield from batched(iter(ds), 8, collator, drop_last=True)

        out = trainer.train(data(), eval_fn=lambda tr: float(next(metric)))
        assert out["final_step"] == 10
        # every post-reset state must still be usable (no deleted buffers)
        jax.device_get(trainer.state.params)


class TestCLI:
    def test_train_v1_reinfoselect_end_to_end(self, vocab_file, tmp_path, capsys):
        from openmatch_tpu.drivers import train_v1

        train, dev, qrels = _fixture_files(tmp_path)
        res = tmp_path / "res.trec"
        train_v1.main([
            "-model", "knrm", "-task", "ranking",
            "-ranking_loss", "triplet_loss", "-reinfoselect", "-reset",
            "-train", train, "-dev", dev, "-qrels", qrels,
            "-vocab", vocab_file, "-save", str(tmp_path / "ckpt"),
            "-res", str(res), "-metric", "ndcg_cut_10",
            "-embed_dim", "8", "-max_query_len", "4", "-max_doc_len", "8",
            "-epoch", "4", "-batch_size", "8", "-lr", "0.05",
            "-eval_every", "2", "-tau", "1.0",
        ])
        out = capsys.readouterr().out
        assert "keep-rate" in out
        assert res.exists()
        lines = res.read_text().strip().splitlines()
        assert lines and all(len(l.split()) == 6 for l in lines)
        assert (tmp_path / "ckpt" / "best" / "train_state.msgpack").exists()

    def test_reinfoselect_requires_dev(self, vocab_file, tmp_path):
        from openmatch_tpu.drivers import train_v1

        train, _, _ = _fixture_files(tmp_path)
        with pytest.raises(ValueError, match="reinfoselect"):
            train_v1.main([
                "-model", "knrm", "-reinfoselect", "-train", train,
                "-vocab", vocab_file, "-save", str(tmp_path / "ckpt"),
            ])
