"""Masked-language-model domain-adaptive pretraining.

Reference: /root/reference/v1/train_bertmlm.py + BertMlmDataset — continue
pretraining a BERT encoder on in-domain text before reranker fine-tuning.

Components: the standard BERT MLM head (dense→gelu→LN→tied-embedding
decoder with output bias) over our BertEncoder, and BERT's 80/10/10
masking (15% of non-special tokens: 80% [MASK], 10% random, 10% kept),
implemented with jax.random so masking runs jitted on device.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..models.bert import ACT2FN, BertConfig, BertEncoder


class MLMModel(nn.Module):
    """Encoder + MLM transform head. ``__call__`` returns the transformed
    hidden states; the tied-embedding decode happens in ``mlm_logits`` as a
    pure function over the param tree (functional tying — no weight copies)."""

    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        cfg = self.config
        hidden = BertEncoder(cfg, dtype=self.dtype, name="bert")(
            input_ids, attention_mask, token_type_ids
        )["last_hidden_state"]
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="transform")(hidden)
        x = ACT2FN[cfg.hidden_act](x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="transform_ln")(x)
        self.param("decoder_bias", nn.initializers.zeros, (cfg.vocab_size,))
        return x


def mlm_logits(model: MLMModel, params, input_ids, attention_mask) -> jnp.ndarray:
    """[B, S, vocab] logits with the decoder tied to the word embeddings.

    The tied decoder assumes embedding dim == hidden_size (standard BERT);
    a factorized-embedding checkpoint (BertConfig.embedding_size set,
    ELECTRA-style) would fail the einsum with a shape error deep in
    tracing — reject it by name instead."""
    cfg = model.config
    emb_dim = getattr(cfg, "embedding_size", None) or cfg.hidden_size
    if emb_dim != cfg.hidden_size:
        raise ValueError(
            f"MLM head ties the decoder to the word-embedding table, which "
            f"requires embedding_size ({emb_dim}) == hidden_size "
            f"({cfg.hidden_size}); factorized-embedding encoders need a "
            "projection back to the embedding dim, which this head does "
            "not implement")
    x = model.apply({"params": params}, input_ids, attention_mask)
    table = params["bert"]["word_embeddings"]["embedding"]
    logits = jnp.einsum("bsd,vd->bsv", x.astype(jnp.float32), table.astype(jnp.float32))
    return logits + params["decoder_bias"]


def mask_tokens(
    rng: jax.Array,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    mask_token_id: int,
    vocab_size: int,
    special_ids: Tuple[int, ...] = (0, 101, 102, 103),
    mlm_probability: float = 0.15,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (masked_ids, labels); labels = -100 where not predicted."""
    r_select, r_action, r_random = jax.random.split(rng, 3)
    special = jnp.zeros_like(input_ids, dtype=bool)
    for sid in special_ids:
        special |= input_ids == sid
    eligible = (attention_mask > 0) & ~special

    selected = (jax.random.uniform(r_select, input_ids.shape) < mlm_probability) & eligible
    labels = jnp.where(selected, input_ids, -100)

    action = jax.random.uniform(r_action, input_ids.shape)
    random_ids = jax.random.randint(r_random, input_ids.shape, 0, vocab_size)
    masked = jnp.where(selected & (action < 0.8), mask_token_id, input_ids)
    masked = jnp.where(selected & (action >= 0.8) & (action < 0.9), random_ids, masked)
    return masked, labels


def mlm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    valid = labels != -100
    safe_labels = jnp.where(valid, labels, 0)
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, safe_labels)
    return (losses * valid).sum() / jnp.clip(valid.sum(), 1, None)
