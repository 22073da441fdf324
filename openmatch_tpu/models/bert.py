"""TPU-native Flax implementation of the BERT encoder family.

Covers BERT / RoBERTa / ELECTRA — the backbones the reference loads through
``AutoModel`` (/root/reference/src/openmatch/modeling/dense_retrieval_model.py:173,209).
Written from scratch for XLA: static shapes, fused QKV projection, fp32
attention softmax with bf16 matmuls, no data-dependent control flow.

Weight interop with HuggingFace PyTorch checkpoints lives in
``models/hf_convert.py``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

ACT2FN = {
    # HF "gelu" is the exact erf GELU; flax's default is the tanh
    # approximation — using it would silently drift from every pretrained
    # BERT checkpoint's training-time activation.
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
    "relu": nn.relu,
    "silu": nn.silu,
    "tanh": jnp.tanh,
}


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    # RoBERTa offsets position ids by pad_token_id + 1.
    position_offset: int = 0
    # ELECTRA may embed at a smaller dim and project up.
    embedding_size: Optional[int] = None
    add_pooler: bool = False
    # Training-regularization parity with the reference's stock AutoModel
    # (dense_retrieval_model.py:173 loads checkpoints whose configs carry
    # ~0.1): applied ONLY when the encoder is called with
    # deterministic=False; inference and the 0.0 default bit-reproduce
    # the dropout-free graph.
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0

    @classmethod
    def from_hf_config(cls, hf) -> "BertConfig":
        """Build from a transformers PretrainedConfig (BERT/RoBERTa/ELECTRA)."""
        model_type = getattr(hf, "model_type", "bert")
        position_offset = hf.pad_token_id + 1 if model_type in ("roberta", "camembert", "xlm-roberta") else 0
        embedding_size = getattr(hf, "embedding_size", None)
        if embedding_size == hf.hidden_size:
            embedding_size = None
        return cls(
            hidden_dropout_prob=getattr(hf, "hidden_dropout_prob", 0.0) or 0.0,
            attention_probs_dropout_prob=getattr(
                hf, "attention_probs_dropout_prob", 0.0) or 0.0,
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            intermediate_size=hf.intermediate_size,
            hidden_act=hf.hidden_act,
            max_position_embeddings=hf.max_position_embeddings,
            type_vocab_size=hf.type_vocab_size,
            layer_norm_eps=hf.layer_norm_eps,
            pad_token_id=hf.pad_token_id or 0,
            position_offset=position_offset,
            embedding_size=embedding_size,
            add_pooler=model_type in ("bert",),
        )

    def to_dict(self):
        return dataclasses.asdict(self)


class BertSelfAttention(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias, deterministic: bool = True):
        cfg = self.config
        d = cfg.hidden_size
        n_heads = cfg.num_attention_heads
        head_dim = d // n_heads

        # Fused QKV: one [d, 3d] matmul keeps the MXU busy.
        qkv = nn.DenseGeneral(
            features=(3, n_heads, head_dim),
            axis=-1,
            dtype=self.dtype,
            name="qkv",
        )(hidden)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]

        # [B, H, S, S] logits in fp32 for a stable softmax.
        scale = 1.0 / jnp.sqrt(head_dim).astype(self.dtype)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        logits = logits + attention_bias  # bias is [B, 1, 1, S], fp32
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attention_probs_dropout_prob)(
            probs, deterministic=deterministic)

        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
        ctx = ctx.astype(self.dtype)
        out = nn.DenseGeneral(
            features=d, axis=(-2, -1), dtype=self.dtype, name="out"
        )(ctx)
        return out


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias, deterministic: bool = True):
        cfg = self.config
        drop = nn.Dropout(cfg.hidden_dropout_prob)
        attn_out = BertSelfAttention(cfg, dtype=self.dtype, name="attention")(
            hidden, attention_bias, deterministic=deterministic
        )
        attn_out = drop(attn_out, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="attention_ln")(
            hidden + attn_out
        )
        ffn = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(hidden)
        ffn = ACT2FN[cfg.hidden_act](ffn)
        ffn = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(ffn)
        ffn = drop(ffn, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="output_ln")(
            hidden + ffn
        )
        return hidden


class BertEncoder(nn.Module):
    """BERT-family encoder returning ``last_hidden_state`` (and pooler output
    when ``config.add_pooler``). Dropout follows HF config semantics
    (reference trains through stock AutoModel checkpoints whose configs
    carry ~0.1, dense_retrieval_model.py:173): active only when called
    with ``deterministic=False`` and an ``rngs={"dropout": key}``; the
    default (and any config with 0.0 rates) bit-reproduces the
    dropout-free graph, so inference and the parity tests are unaffected.
    """

    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.config
        B, S = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        emb_dim = cfg.embedding_size or cfg.hidden_size
        word_emb = nn.Embed(cfg.vocab_size, emb_dim, dtype=self.dtype, name="word_embeddings")(
            input_ids
        )
        if cfg.position_offset:
            # RoBERTa: positions count non-pad tokens, offset by pad_id + 1.
            positions = jnp.cumsum(attention_mask, axis=-1) * attention_mask
            positions = positions + cfg.position_offset - 1
        else:
            positions = jnp.arange(S)[None, :].astype(jnp.int32)
            positions = jnp.broadcast_to(positions, (B, S))
        pos_emb = nn.Embed(
            cfg.max_position_embeddings, emb_dim, dtype=self.dtype, name="position_embeddings"
        )(positions.astype(jnp.int32))
        type_emb = nn.Embed(
            cfg.type_vocab_size, emb_dim, dtype=self.dtype, name="token_type_embeddings"
        )(token_type_ids)

        hidden = word_emb + pos_emb + type_emb
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="embeddings_ln"
        )(hidden)
        hidden = nn.Dropout(cfg.hidden_dropout_prob)(
            hidden, deterministic=deterministic)
        if cfg.embedding_size and cfg.embedding_size != cfg.hidden_size:
            hidden = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="embeddings_project")(hidden)

        # Additive attention bias: 0 where attended, large negative where masked.
        bias = jnp.where(
            attention_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
        ).astype(jnp.float32)

        for i in range(cfg.num_hidden_layers):
            hidden = BertLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                hidden, bias, deterministic=deterministic)

        outputs = {"last_hidden_state": hidden}
        if cfg.add_pooler:
            pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pooler")(hidden[:, 0])
            outputs["pooler_output"] = jnp.tanh(pooled)
        return outputs
