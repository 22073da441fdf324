"""Building blocks for the v1-parity neural rerankers.

Reference: /root/reference/v1/OpenMatch/modules/**. Flax/XLA redesign notes:

- Embedder keeps padding_idx=0 as a zeroed row (enforced at apply time so
  loaded GloVe matrices behave identically).
- Conv1DEncoder: per-kernel-size VALID 1-D convs + ReLU; returns both the
  max-pooled summary and per-size sequence encodings (cnn_encoder.py:35-43).
- TransformerEncoder: sinusoidal positions + post-LN blocks
  (transformer_encoder.py). Deliberate deviation: the reference's head
  reshape (multi_head_attention.py:31-39) interleaves sequence and head
  dims and its scale uses head_dim//head_num — artifacts, not design; we
  implement standard multi-head attention with head_dim**-0.5 scaling.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Embedder(nn.Module):
    vocab_size: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.normal(1.0),
            (self.vocab_size, self.embed_dim),
        )
        table = table.at[0].set(0.0)  # padding_idx=0
        return jnp.take(table, ids, axis=0).astype(self.dtype)


class Conv1DEncoder(nn.Module):
    embed_dim: int
    kernel_dim: int
    kernel_sizes: Sequence[int] = (2, 3, 4, 5)
    dtype: Any = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.kernel_dim * len(self.kernel_sizes)

    @nn.compact
    def __call__(self, embed: jnp.ndarray, masks: jnp.ndarray = None) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        if masks is not None:
            embed = embed * masks[..., None].astype(embed.dtype)
        seq_encs = []
        pooled = []
        for size in self.kernel_sizes:
            conv = nn.Conv(
                features=self.kernel_dim,
                kernel_size=(size,),
                padding="VALID",
                dtype=self.dtype,
                name=f"conv_{size}",
            )(embed)  # [B, L-size+1, kernel_dim]
            conv = nn.relu(conv)
            seq_encs.append(conv)
            pooled.append(conv.max(axis=1))
        summary = jnp.concatenate(pooled, axis=1) if len(pooled) > 1 else pooled[0]
        return summary, seq_encs


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    pos = np.arange(max_len)[:, None]
    i = np.arange(dim)[None, :]
    angle = pos / np.power(1.0e4, 2.0 * (i // 2) / dim)
    table = np.zeros((max_len, dim), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class TransformerEncoderLayer(nn.Module):
    embed_dim: int
    head_num: int = 8
    hidden_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, L, D = embed.shape
        head_dim = self.embed_dim // self.head_num

        def proj(name):
            return nn.DenseGeneral((self.head_num, head_dim), axis=-1,
                                   dtype=self.dtype, name=name)(embed)

        q, k, v = proj("q"), proj("k"), proj("v")
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (head_dim**-0.5)
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e32)
        probs = jnp.asarray(nn.softmax(logits + bias, axis=-1), self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = nn.DenseGeneral(self.embed_dim, axis=(-2, -1), dtype=self.dtype, name="out")(ctx)
        hidden = nn.LayerNorm(dtype=self.dtype, name="attn_ln")(embed + out)

        ff = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(hidden)
        ff = nn.relu(ff)
        ff = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(ff)
        return nn.LayerNorm(dtype=self.dtype, name="ff_ln")(hidden + ff)


class TransformerEncoder(nn.Module):
    embed_dim: int
    head_num: int = 8
    hidden_dim: int = 2048
    layer_num: int = 6
    max_len: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        L = embed.shape[1]
        pos = jnp.asarray(sinusoidal_positions(self.max_len, self.embed_dim))[:L]
        enc = embed + pos[None].astype(embed.dtype)
        for i in range(self.layer_num):
            enc = TransformerEncoderLayer(
                self.embed_dim, self.head_num, self.hidden_dim,
                dtype=self.dtype, name=f"layer_{i}",
            )(enc, mask)
        return enc
