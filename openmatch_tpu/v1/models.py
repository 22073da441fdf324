"""v1-parity neural rerankers: KNRM, Conv-KNRM, TK, EDRM, Bert, BertMaxP.

Reference: /root/reference/v1/OpenMatch/models/*.py. Each model scores a
(query, doc) pair: ``ranking`` task → scalar score; ``classification`` →
2 logits. All are plain Flax modules usable with the RR training loop.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..models.bert import BertConfig, BertEncoder
from .kernel_matcher import KernelMatcher
from .modules import Conv1DEncoder, Embedder, TransformerEncoder


def _task_head(task: str, name: str = "dense"):
    if task == "ranking":
        return nn.Dense(1, name=name)
    if task == "classification":
        return nn.Dense(2, name=name)
    raise ValueError("Task must be `ranking` or `classification`.")


def _squeeze_score(score: jnp.ndarray) -> jnp.ndarray:
    return score[..., 0] if score.shape[-1] == 1 else score


class KNRM(nn.Module):
    """Kernel pooling over the raw-embedding cosine match matrix
    (reference knrm.py:9-40)."""

    vocab_size: int
    embed_dim: int
    kernel_num: int = 21
    task: str = "ranking"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_ids, query_masks, doc_ids, doc_masks):
        embedder = Embedder(self.vocab_size, self.embed_dim, dtype=self.dtype, name="embedder")
        matcher = KernelMatcher(self.kernel_num)
        logits = matcher(embedder(query_ids), query_masks, embedder(doc_ids), doc_masks)
        score = _task_head(self.task)(logits)
        return _squeeze_score(score), logits


class ConvKNRM(nn.Module):
    """n-gram conv encodings cross-matched with kernel pooling
    (reference conv_knrm.py:10-49: len(sizes)^2 matcher calls concat)."""

    vocab_size: int
    embed_dim: int
    kernel_num: int = 21
    kernel_dim: int = 128
    kernel_sizes: Sequence[int] = (1, 2, 3)
    task: str = "ranking"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_ids, query_masks, doc_ids, doc_masks):
        embedder = Embedder(self.vocab_size, self.embed_dim, dtype=self.dtype, name="embedder")
        encoder = Conv1DEncoder(self.embed_dim, self.kernel_dim, self.kernel_sizes,
                                dtype=self.dtype, name="encoder")
        matcher = KernelMatcher(self.kernel_num)
        _, q_encs = encoder(embedder(query_ids), query_masks)
        _, d_encs = encoder(embedder(doc_ids), doc_masks)
        feats = [
            matcher(q_enc, query_masks[:, : q_enc.shape[1]], d_enc, doc_masks[:, : d_enc.shape[1]])
            for q_enc in q_encs
            for d_enc in d_encs
        ]
        logits = jnp.concatenate(feats, axis=1)
        score = _task_head(self.task)(logits)
        return _squeeze_score(score), logits


class TK(nn.Module):
    """Transformer-contextualized kernel ranking (reference tk.py:10-55):
    learned mixer blends raw embeddings with transformer context before
    kernel pooling."""

    vocab_size: int
    embed_dim: int
    head_num: int = 10
    hidden_dim: int = 100
    layer_num: int = 2
    kernel_num: int = 21
    task: str = "ranking"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_ids, query_masks, doc_ids, doc_masks):
        embedder = Embedder(self.vocab_size, self.embed_dim, dtype=self.dtype, name="embedder")
        encoder = TransformerEncoder(self.embed_dim, self.head_num, self.hidden_dim,
                                     self.layer_num, dtype=self.dtype, name="encoder")
        mixer = self.param("mixer", nn.initializers.constant(0.5), (1, 1, 1))
        matcher = KernelMatcher(self.kernel_num)

        q_embed = embedder(query_ids)
        d_embed = embedder(doc_ids)
        q_ctx = encoder(q_embed, query_masks)
        d_ctx = encoder(d_embed, doc_masks)
        q_mix = mixer * q_embed + (1 - mixer) * q_ctx
        d_mix = mixer * d_embed + (1 - mixer) * d_ctx
        logits = matcher(q_mix, query_masks, d_mix, doc_masks)
        score = _task_head(self.task)(logits)
        return _squeeze_score(score), logits


class EDRM(nn.Module):
    """Entity-Duet ranking (reference edrm.py:10-74): word n-gram encodings
    plus an entity channel enriched by conv+maxpool over entity
    descriptions; (n_sizes+1)^2 cross matcher calls."""

    wrd_vocab_size: int
    ent_vocab_size: int
    wrd_embed_dim: int
    ent_embed_dim: int
    max_des_len: int = 20
    max_ent_num: int = 3
    kernel_num: int = 21
    kernel_dim: int = 128
    kernel_sizes: Sequence[int] = (1, 2, 3)
    task: str = "ranking"
    dtype: Any = jnp.float32

    def setup(self):
        if self.ent_embed_dim != self.kernel_dim:
            raise ValueError("ent_embed_dim must equal kernel_dim.")
        self.wrd_embedder = Embedder(self.wrd_vocab_size, self.wrd_embed_dim, dtype=self.dtype)
        self.ent_embedder = Embedder(self.ent_vocab_size, self.ent_embed_dim, dtype=self.dtype)
        self.wrd_encoder = Conv1DEncoder(self.wrd_embed_dim, self.kernel_dim,
                                         self.kernel_sizes, dtype=self.dtype)
        self.des_encoder = Conv1DEncoder(self.wrd_embed_dim * self.max_ent_num,
                                         self.kernel_dim, (1,), dtype=self.dtype)
        self.matcher = KernelMatcher(self.kernel_num)
        self.dense = _task_head(self.task)

    def _entity_channel(self, ent_embed, des_embed):
        """ent embedding + maxpool over the conv-encoded description window
        (reference edrm.py:66-70)."""
        B = des_embed.shape[0]
        des = des_embed.reshape(B, -1, self.wrd_embed_dim * self.max_ent_num)
        _, des_encs = self.des_encoder(des)
        # [B, positions, kernel_dim] → per-entity window max over
        # max_des_len - max_ent_num + 1 positions
        win = self.max_des_len - self.max_ent_num + 1
        seq = des_encs[0]
        n_ent = seq.shape[1] // win
        pooled = seq[:, : n_ent * win].reshape(B, n_ent, win, -1).max(axis=2)
        return ent_embed + pooled

    def __call__(self, query_wrd_ids, query_wrd_masks, doc_wrd_ids, doc_wrd_masks,
                 query_ent_ids, query_ent_masks, doc_ent_ids, doc_ent_masks,
                 query_des_ids, doc_des_ids):
        _, q_encs = self.wrd_encoder(self.wrd_embedder(query_wrd_ids), query_wrd_masks)
        _, d_encs = self.wrd_encoder(self.wrd_embedder(doc_wrd_ids), doc_wrd_masks)
        q_encs = list(q_encs)
        d_encs = list(d_encs)
        q_encs.append(self._entity_channel(self.ent_embedder(query_ent_ids),
                                           self.wrd_embedder(query_des_ids)))
        d_encs.append(self._entity_channel(self.ent_embedder(doc_ent_ids),
                                           self.wrd_embedder(doc_des_ids)))

        feats = []
        for i, q_enc in enumerate(q_encs):
            q_mask = query_ent_masks if i + 1 == len(q_encs) else query_wrd_masks
            for j, d_enc in enumerate(d_encs):
                d_mask = doc_ent_masks if j + 1 == len(d_encs) else doc_wrd_masks
                feats.append(self.matcher(
                    q_enc, q_mask[:, : q_enc.shape[1]], d_enc, d_mask[:, : d_enc.shape[1]]
                ))
        logits = jnp.concatenate(feats, axis=1)
        score = self.dense(logits)
        return _squeeze_score(score), logits


class BertRanker(nn.Module):
    """HF-backbone pointwise ranker (reference bert.py:8-39): cls or pooler
    rep → task head."""

    config: BertConfig
    mode: str = "cls"
    task: str = "ranking"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, input_mask, segment_ids=None):
        outputs = BertEncoder(self.config, dtype=self.dtype, name="bert")(
            input_ids, input_mask, segment_ids
        )
        if self.mode == "cls":
            logits = outputs["last_hidden_state"][:, 0, :]
        elif self.mode == "pooling":
            logits = outputs["pooler_output"]
        else:
            raise ValueError("Mode must be `cls` or `pooling`.")
        score = _task_head(self.task)(logits)
        return _squeeze_score(score), logits


class BertMaxP(nn.Module):
    """Long-document scoring by chunk-and-maxpool (reference bert_maxp.py:37-48):
    the doc is pre-split into ``num_passages`` BERT inputs; per-passage reps
    are max-pooled, then ReLU-MLP scored. The [B, P, L] → [B*P, L] reshape
    keeps one big MXU-friendly batch — this is the reference's entire
    "sequence scaling" strategy (SURVEY.md §5), no ring attention needed."""

    config: BertConfig
    num_passages: int = 4
    mode: str = "cls"
    task: str = "ranking"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, input_mask, segment_ids=None):
        B, P, L = input_ids.shape
        assert P == self.num_passages
        flat = lambda x: None if x is None else x.reshape(B * P, L)
        outputs = BertEncoder(self.config, dtype=self.dtype, name="bert")(
            flat(input_ids), flat(input_mask), flat(segment_ids)
        )
        if self.mode == "cls":
            reps = outputs["last_hidden_state"][:, 0, :]
        elif self.mode == "pooling":
            reps = outputs["pooler_output"]
        else:
            raise ValueError("Mode must be `cls` or `pooling`.")
        reps = reps.reshape(B, P, -1).max(axis=1)
        hidden = nn.relu(nn.Dense(128, name="dense1")(reps))
        score = _task_head(self.task, name="dense2")(hidden)
        return _squeeze_score(score), hidden
