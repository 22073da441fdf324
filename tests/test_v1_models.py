"""v1-parity rerankers: kernel matcher golden vs torch reference semantics,
model shapes, and trainability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.models.bert import BertConfig
from openmatch_tpu.v1.kernel_matcher import KernelMatcher, kernel_mus_sigmas
from openmatch_tpu.v1.models import KNRM, TK, BertMaxP, BertRanker, ConvKNRM, EDRM


def torch_kernel_matcher(k_embed, k_mask, v_embed, v_mask, kernel_num=21):
    """numpy re-derivation of the reference matcher (kernel_matcher.py:33-44)."""
    mus, sigmas = kernel_mus_sigmas(kernel_num)
    k = k_embed * k_mask[..., None]
    v = v_embed * v_mask[..., None]
    kn = k / np.clip(np.linalg.norm(k, axis=-1, keepdims=True), 1e-10, None)
    vn = v / np.clip(np.linalg.norm(v, axis=-1, keepdims=True), 1e-10, None)
    inter = np.einsum("bqd,bvd->bqv", kn, vn) * (k_mask[:, :, None] * v_mask[:, None, :])
    kern = np.exp(-((inter[..., None] - mus) ** 2) / (sigmas**2) / 2)
    pooled = np.log(np.clip(kern.sum(axis=2), 1e-10, None)) * 1e-2
    return pooled.sum(axis=1)


class TestKernelMatcher:
    def test_mus_sigmas(self):
        mus, sigmas = kernel_mus_sigmas(11)
        assert mus[0] == 1.0
        assert mus[1] == pytest.approx(1 - 0.1)
        assert sigmas[0] == 0.001 and sigmas[1] == 0.1
        assert len(mus) == 11

    def test_matches_reference_semantics(self):
        rng = np.random.RandomState(0)
        q = rng.randn(2, 5, 8).astype(np.float32)
        d = rng.randn(2, 7, 8).astype(np.float32)
        qm = np.ones((2, 5), np.float32); qm[1, 3:] = 0
        dm = np.ones((2, 7), np.float32); dm[0, 4:] = 0
        expected = torch_kernel_matcher(q, qm, d, dm)
        got = KernelMatcher(21)(jnp.array(q), jnp.array(qm), jnp.array(d), jnp.array(dm))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)

    def test_exact_match_kernel_dominates_for_identical(self):
        v = np.ones((1, 1, 4), np.float32)
        m = np.ones((1, 1), np.float32)
        feats = np.asarray(KernelMatcher(21)(jnp.array(v), jnp.array(m), jnp.array(v), jnp.array(m)))
        assert feats[0, 0] == feats.max()  # cos=1 lights up the delta kernel


def _qd_batch(rng, b=3, lq=5, ld=9, vocab=50):
    q = rng.randint(1, vocab, size=(b, lq)).astype(np.int32)
    d = rng.randint(1, vocab, size=(b, ld)).astype(np.int32)
    qm = np.ones((b, lq), np.float32)
    dm = np.ones((b, ld), np.float32)
    return jnp.array(q), jnp.array(qm), jnp.array(d), jnp.array(dm)


class TestModels:
    def test_knrm_shapes_and_grad(self):
        rng = np.random.RandomState(0)
        model = KNRM(vocab_size=50, embed_dim=16)
        q, qm, d, dm = _qd_batch(rng)
        params = model.init(jax.random.PRNGKey(0), q, qm, d, dm)["params"]
        score, logits = model.apply({"params": params}, q, qm, d, dm)
        assert score.shape == (3,)
        assert logits.shape == (3, 21)

        def loss(p):
            s, _ = model.apply({"params": p}, q, qm, d, dm)
            return s.sum()

        grads = jax.grad(loss)(params)
        assert np.isfinite(jax.tree.leaves(grads)[0]).all()

    def test_knrm_classification(self):
        rng = np.random.RandomState(0)
        model = KNRM(vocab_size=50, embed_dim=16, task="classification")
        q, qm, d, dm = _qd_batch(rng)
        params = model.init(jax.random.PRNGKey(0), q, qm, d, dm)["params"]
        score, _ = model.apply({"params": params}, q, qm, d, dm)
        assert score.shape == (3, 2)

    def test_conv_knrm(self):
        rng = np.random.RandomState(0)
        model = ConvKNRM(vocab_size=50, embed_dim=16, kernel_dim=8, kernel_sizes=(1, 2, 3))
        q, qm, d, dm = _qd_batch(rng)
        params = model.init(jax.random.PRNGKey(0), q, qm, d, dm)["params"]
        score, logits = model.apply({"params": params}, q, qm, d, dm)
        assert score.shape == (3,)
        assert logits.shape == (3, 21 * 9)  # 3x3 cross-match

    def test_tk(self):
        rng = np.random.RandomState(0)
        model = TK(vocab_size=50, embed_dim=20, head_num=4, hidden_dim=32, layer_num=2)
        q, qm, d, dm = _qd_batch(rng)
        params = model.init(jax.random.PRNGKey(0), q, qm, d, dm)["params"]
        score, logits = model.apply({"params": params}, q, qm, d, dm)
        assert score.shape == (3,)
        assert "mixer" in params
        assert float(params["mixer"][0, 0, 0]) == pytest.approx(0.5)

    def test_edrm(self):
        rng = np.random.RandomState(0)
        B, LQ, LD, ENT, DES = 2, 5, 9, 3, 20
        model = EDRM(wrd_vocab_size=50, ent_vocab_size=30, wrd_embed_dim=16,
                     ent_embed_dim=8, kernel_dim=8, kernel_sizes=(1, 2),
                     max_des_len=DES, max_ent_num=ENT)
        args = (
            jnp.array(rng.randint(1, 50, (B, LQ)).astype(np.int32)),
            jnp.ones((B, LQ), jnp.float32),
            jnp.array(rng.randint(1, 50, (B, LD)).astype(np.int32)),
            jnp.ones((B, LD), jnp.float32),
            jnp.array(rng.randint(1, 30, (B, ENT)).astype(np.int32)),
            jnp.ones((B, ENT), jnp.float32),
            jnp.array(rng.randint(1, 30, (B, ENT)).astype(np.int32)),
            jnp.ones((B, ENT), jnp.float32),
            jnp.array(rng.randint(1, 50, (B, ENT * DES)).astype(np.int32)),
            jnp.array(rng.randint(1, 50, (B, ENT * DES)).astype(np.int32)),
        )
        params = model.init(jax.random.PRNGKey(0), *args)["params"]
        score, logits = model.apply({"params": params}, *args)
        assert score.shape == (B,)
        assert logits.shape == (B, 21 * 9)  # (2 sizes + ent)^2

    def test_bert_ranker(self):
        cfg = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=32, add_pooler=True)
        model = BertRanker(config=cfg, mode="pooling")
        rng = np.random.RandomState(0)
        ids = jnp.array(rng.randint(1, 64, (2, 10)).astype(np.int32))
        mask = jnp.ones((2, 10), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
        score, _ = model.apply({"params": params}, ids, mask)
        assert score.shape == (2,)

    def test_bert_maxp(self):
        cfg = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=32, add_pooler=False)
        model = BertMaxP(config=cfg, num_passages=4)
        rng = np.random.RandomState(0)
        ids = jnp.array(rng.randint(1, 64, (2, 4, 12)).astype(np.int32))
        mask = jnp.ones((2, 4, 12), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
        score, _ = model.apply({"params": params}, ids, mask)
        assert score.shape == (2,)
