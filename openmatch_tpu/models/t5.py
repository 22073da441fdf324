"""TPU-native Flax implementation of the T5 stack.

Covers both reference T5 uses:
- ``T5EncoderModel`` (encoder-only reps; reference dense_retrieval_model.py:173
  with ``--encoder_only``)
- full encoder-decoder with a single decoder step fed ``decoder_input_ids=0``:
  the DR rep is decoder token 0's hidden state
  (reference dense_retrieval_model.py:137-141), and monoT5 reranking scores
  are that step's logits at ``[neg_token, pos_token]``
  (reference reranking_model.py:110-114).

Implementation notes (T5 semantics, written for XLA):
- RMSNorm without bias/mean-centering; pre-LN blocks; bias-free Dense.
- Bucketed relative position bias, computed once per stack and shared by all
  layers (only layer 0 owns the embedding table).
- Attention logits are NOT scaled by 1/sqrt(head_dim) (T5 folds scaling into
  initialization).
- lm_head: tied models scale decoder output by d_model**-0.5 before the
  shared embedding matmul; v1.1-style models have an untied lm_head.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .bert import ACT2FN


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_decoder_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"  # "relu" | "gated-gelu"
    tie_word_embeddings: bool = True
    decoder_start_token_id: int = 0
    pad_token_id: int = 0
    # HF-config dropout (modeling_t5: embeddings, sublayer outputs, FFN
    # inner, attention probs). Active only under deterministic=False with
    # a "dropout" rng; 0.0 (default) bit-reproduces the dropout-free graph.
    dropout_rate: float = 0.0

    @property
    def is_gated(self) -> bool:
        return self.feed_forward_proj.startswith("gated")

    @property
    def ff_act(self) -> str:
        if self.is_gated:
            return self.feed_forward_proj.split("-")[1]
        return self.feed_forward_proj

    @classmethod
    def from_hf_config(cls, hf) -> "T5Config":
        return cls(
            vocab_size=hf.vocab_size,
            d_model=hf.d_model,
            d_kv=hf.d_kv,
            d_ff=hf.d_ff,
            num_layers=hf.num_layers,
            num_decoder_layers=getattr(hf, "num_decoder_layers", hf.num_layers),
            num_heads=hf.num_heads,
            relative_attention_num_buckets=hf.relative_attention_num_buckets,
            relative_attention_max_distance=getattr(hf, "relative_attention_max_distance", 128),
            layer_norm_epsilon=hf.layer_norm_epsilon,
            feed_forward_proj=hf.feed_forward_proj.replace("gated-gelu_new", "gated-gelu"),
            tie_word_embeddings=getattr(hf, "tie_word_embeddings", True),
            decoder_start_token_id=getattr(hf, "decoder_start_token_id", 0) or 0,
            pad_token_id=hf.pad_token_id or 0,
            dropout_rate=getattr(hf, "dropout_rate", 0.0) or 0.0,
        )

    def to_dict(self):
        return dataclasses.asdict(self)


class RMSNorm(nn.Module):
    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = (x.astype(jnp.float32) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))).astype(self.dtype)
        return x * scale.astype(self.dtype)


def relative_position_bucket(relative_position, bidirectional: bool, num_buckets: int, max_distance: int):
    """T5's log-bucketed relative positions (HF modeling_t5 semantics)."""
    ret = 0
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    ret += jnp.where(is_small, n, val_if_large)
    return ret


class T5Attention(nn.Module):
    config: T5Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, kv_hidden, bias, deterministic: bool = True):
        """bias: [1 or B, H, Sq, Skv] additive (pos bias + mask)."""
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        q = nn.DenseGeneral((cfg.num_heads, cfg.d_kv), axis=-1, use_bias=False, dtype=self.dtype, name="q")(hidden)
        k = nn.DenseGeneral((cfg.num_heads, cfg.d_kv), axis=-1, use_bias=False, dtype=self.dtype, name="k")(kv_hidden)
        v = nn.DenseGeneral((cfg.num_heads, cfg.d_kv), axis=-1, use_bias=False, dtype=self.dtype, name="v")(kv_hidden)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits + bias
        probs = jnp.asarray(nn.softmax(logits, axis=-1), self.dtype)
        probs = nn.Dropout(cfg.dropout_rate)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
        ctx = ctx.astype(self.dtype)
        out = nn.DenseGeneral(cfg.d_model, axis=(-2, -1), use_bias=False, dtype=self.dtype, name="o")(ctx)
        return out


class T5FeedForward(nn.Module):
    config: T5Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, deterministic: bool = True):
        cfg = self.config
        act = ACT2FN["gelu_new" if cfg.ff_act == "gelu" else cfg.ff_act]
        if cfg.is_gated:
            wi0 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(hidden)
            wi1 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(hidden)
            hidden = act(wi0) * wi1
        else:
            hidden = act(nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi")(hidden))
        hidden = nn.Dropout(cfg.dropout_rate)(hidden, deterministic=deterministic)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(hidden)


class T5Block(nn.Module):
    config: T5Config
    is_decoder: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, self_bias, enc_hidden=None, cross_bias=None,
                 deterministic: bool = True):
        cfg = self.config
        drop = nn.Dropout(cfg.dropout_rate)
        normed = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="self_attn_ln")(hidden)
        hidden = hidden + drop(
            T5Attention(cfg, dtype=self.dtype, name="self_attn")(
                normed, normed, self_bias, deterministic=deterministic),
            deterministic=deterministic)
        if self.is_decoder:
            normed = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="cross_attn_ln")(hidden)
            hidden = hidden + drop(
                T5Attention(cfg, dtype=self.dtype, name="cross_attn")(
                    normed, enc_hidden, cross_bias, deterministic=deterministic),
                deterministic=deterministic)
        normed = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="ff_ln")(hidden)
        hidden = hidden + drop(
            T5FeedForward(cfg, dtype=self.dtype, name="ff")(
                normed, deterministic=deterministic),
            deterministic=deterministic)
        return hidden


def _mask_bias(attention_mask):
    return jnp.where(attention_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min).astype(jnp.float32)


class T5Encoder(nn.Module):
    """Encoder-only stack; returns {"last_hidden_state": [B, S, D]}."""

    config: T5Config
    dtype: Any = jnp.float32
    # Shared token embedding is owned here under name "shared".

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        cfg = self.config
        drop = nn.Dropout(cfg.dropout_rate)
        S = input_ids.shape[1]
        shared = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="shared")
        hidden = drop(shared(input_ids), deterministic=deterministic)

        rel_bias_table = self.param(
            "rel_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        pos = jnp.arange(S)
        rel = pos[None, :] - pos[:, None]  # memory - query
        buckets = relative_position_bucket(
            rel, True, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        pos_bias = jnp.asarray(rel_bias_table, jnp.float32)[buckets]  # [Sq, Skv, H]
        pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]  # [1, H, Sq, Skv]
        bias = pos_bias + _mask_bias(attention_mask)

        for i in range(cfg.num_layers):
            hidden = T5Block(cfg, is_decoder=False, dtype=self.dtype, name=f"layer_{i}")(
                hidden, bias, deterministic=deterministic)
        hidden = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="final_ln")(hidden)
        hidden = drop(hidden, deterministic=deterministic)
        return {"last_hidden_state": hidden}


class T5EncoderDecoderStep(nn.Module):
    """Encode then run ONE decoder step with the start token.

    Returns {"decoder_hidden": [B, 1, D], "logits": [B, 1, V]}. This is all
    the reference ever needs from the T5 decoder (DR rep at :137-141, monoT5
    two-token scores at reranking_model.py:110-114), so no KV cache or
    autoregressive loop exists — one fused forward.
    """

    config: T5Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        cfg = self.config
        drop = nn.Dropout(cfg.dropout_rate)
        shared = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="shared")

        # ---- encoder ----
        S = input_ids.shape[1]
        hidden = drop(shared(input_ids), deterministic=deterministic)
        enc_table = self.param(
            "enc_rel_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        pos = jnp.arange(S)
        rel = pos[None, :] - pos[:, None]
        buckets = relative_position_bucket(
            rel, True, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        pos_bias = jnp.transpose(jnp.asarray(enc_table, jnp.float32)[buckets], (2, 0, 1))[None]
        enc_bias = pos_bias + _mask_bias(attention_mask)
        for i in range(cfg.num_layers):
            hidden = T5Block(cfg, is_decoder=False, dtype=self.dtype, name=f"enc_layer_{i}")(
                hidden, enc_bias, deterministic=deterministic)
        enc_hidden = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="enc_final_ln")(hidden)
        enc_hidden = drop(enc_hidden, deterministic=deterministic)

        # ---- single decoder step ----
        B = input_ids.shape[0]
        dec_ids = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)
        dec_hidden = drop(shared(dec_ids), deterministic=deterministic)
        dec_table = self.param(
            "dec_rel_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        # single position: relative position 0 → bucket 0, but compute anyway
        dbuckets = relative_position_bucket(
            jnp.zeros((1, 1), jnp.int32),
            False,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        dec_self_bias = jnp.transpose(jnp.asarray(dec_table, jnp.float32)[dbuckets], (2, 0, 1))[None]
        cross_bias = _mask_bias(attention_mask)  # no position bias on cross-attn
        for i in range(cfg.num_decoder_layers):
            dec_hidden = T5Block(cfg, is_decoder=True, dtype=self.dtype, name=f"dec_layer_{i}")(
                dec_hidden, dec_self_bias, enc_hidden, cross_bias,
                deterministic=deterministic
            )
        dec_hidden = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="dec_final_ln")(dec_hidden)
        dec_hidden = drop(dec_hidden, deterministic=deterministic)

        if cfg.tie_word_embeddings:
            scaled = dec_hidden * (cfg.d_model**-0.5)
            logits = shared.attend(scaled.astype(jnp.float32))
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head")(dec_hidden)
        return {"decoder_hidden": dec_hidden, "logits": logits, "last_hidden_state": enc_hidden}




class T5Seq2Seq(nn.Module):
    """Full encoder-decoder with teacher forcing over arbitrary decoder ids.

    Parameter tree is IDENTICAL to T5EncoderDecoderStep (same submodule
    names), so convert_t5_encdec_state_dict / existing checkpoints serve
    both; the one-step module stays the fused fast path for retrieval and
    monoT5 while this one powers generation (query synthesis, ContrastQG —
    reference v1/Contrastive_Supervision_Synthesis).
    """

    config: T5Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, decoder_input_ids,
                 decoder_attention_mask=None, deterministic: bool = True):
        cfg = self.config
        drop = nn.Dropout(cfg.dropout_rate)
        shared = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="shared")

        # ---- encoder ----
        S = input_ids.shape[1]
        hidden = drop(shared(input_ids), deterministic=deterministic)
        enc_table = self.param(
            "enc_rel_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        pos = jnp.arange(S)
        rel = pos[None, :] - pos[:, None]
        buckets = relative_position_bucket(
            rel, True, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        pos_bias = jnp.transpose(jnp.asarray(enc_table, jnp.float32)[buckets], (2, 0, 1))[None]
        enc_bias = pos_bias + _mask_bias(attention_mask)
        for i in range(cfg.num_layers):
            hidden = T5Block(cfg, is_decoder=False, dtype=self.dtype, name=f"enc_layer_{i}")(
                hidden, enc_bias, deterministic=deterministic)
        enc_hidden = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="enc_final_ln")(hidden)
        enc_hidden = drop(enc_hidden, deterministic=deterministic)

        # ---- decoder with causal self-attention ----
        T = decoder_input_ids.shape[1]
        dec_hidden = drop(shared(decoder_input_ids), deterministic=deterministic)
        dec_table = self.param(
            "dec_rel_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        dpos = jnp.arange(T)
        drel = dpos[None, :] - dpos[:, None]
        dbuckets = relative_position_bucket(
            drel, False, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        dec_pos_bias = jnp.transpose(jnp.asarray(dec_table, jnp.float32)[dbuckets], (2, 0, 1))[None]
        causal = jnp.where(
            dpos[None, :] <= dpos[:, None], 0.0, jnp.finfo(jnp.float32).min
        )[None, None]
        dec_self_bias = dec_pos_bias + causal
        if decoder_attention_mask is not None:
            dec_self_bias = dec_self_bias + _mask_bias(decoder_attention_mask)
        cross_bias = _mask_bias(attention_mask)
        for i in range(cfg.num_decoder_layers):
            dec_hidden = T5Block(cfg, is_decoder=True, dtype=self.dtype, name=f"dec_layer_{i}")(
                dec_hidden, dec_self_bias, enc_hidden, cross_bias,
                deterministic=deterministic
            )
        dec_hidden = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="dec_final_ln")(dec_hidden)
        dec_hidden = drop(dec_hidden, deterministic=deterministic)

        if cfg.tie_word_embeddings:
            logits = shared.attend((dec_hidden * (cfg.d_model**-0.5)).astype(jnp.float32))
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head")(dec_hidden)
        return {"logits": logits, "decoder_hidden": dec_hidden, "last_hidden_state": enc_hidden}


def shift_right(ids: jnp.ndarray, start_token_id: int, pad_token_id: int = 0) -> jnp.ndarray:
    """Teacher-forcing decoder inputs: [start, y_0, ..., y_{T-2}]."""
    shifted = jnp.roll(ids, 1, axis=-1).at[:, 0].set(start_token_id)
    return jnp.where(shifted == -100, pad_token_id, shifted)


def seq2seq_loss(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Token-mean CE over labeled positions (mask 0 = pad)."""
    import optax

    losses = optax.softmax_cross_entropy_with_integer_labels(logits, jnp.maximum(labels, 0))
    m = mask.astype(jnp.float32)
    return (losses * m).sum() / jnp.clip(m.sum(), 1.0, None)


import functools as _functools


@_functools.lru_cache(maxsize=8)
def _cached_decode_step(model: "T5Seq2Seq"):
    """One jitted decode step per model instance — defining the jit inside
    greedy_generate would recompile the full seq2seq graph on every call."""

    @jax.jit
    def step_logits(params, enc_ids, enc_mask, dec_ids):
        return model.apply({"params": params}, enc_ids, enc_mask, dec_ids)["logits"]

    return step_logits


def greedy_generate(model: "T5Seq2Seq", params, input_ids, attention_mask,
                    max_new_tokens: int = 32, eos_token_id: int = 1,
                    temperature: float = 0.0, rng=None) -> jnp.ndarray:
    """Autoregressive decode by full re-run per step (no KV cache).

    O(T^2) in decoder length — fine for <=64-token queries. Returns
    [B, max_new_tokens] generated ids (eos-padded).
    """
    cfg = model.config
    B = input_ids.shape[0]
    dec = jnp.full((B, max_new_tokens + 1), cfg.pad_token_id, jnp.int32)
    dec = dec.at[:, 0].set(cfg.decoder_start_token_id)
    finished = jnp.zeros((B,), bool)

    step_logits = _cached_decode_step(model)

    for t in range(max_new_tokens):
        logits = step_logits(params, input_ids, attention_mask, dec)[:, t, :]
        if temperature and rng is not None:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, eos_token_id, nxt).astype(jnp.int32)
        dec = dec.at[:, t + 1].set(nxt)
        finished = finished | (nxt == eos_token_id)
    return dec[:, 1:]


# ---------------------------------------------------------------------------
# HF torch → Flax conversion
# ---------------------------------------------------------------------------


def _t5_block_params(sd: Dict[str, np.ndarray], prefix: str, cfg: T5Config, is_decoder: bool) -> Dict[str, Any]:
    def attn(p):
        def dg_in(name):  # [inner, d_model] -> [d_model, H, d_kv]
            w = sd[f"{p}.{name}.weight"].T
            return w.reshape(cfg.d_model, cfg.num_heads, cfg.d_kv)

        o = sd[f"{p}.o.weight"].T.reshape(cfg.num_heads, cfg.d_kv, cfg.d_model)
        return {
            "q": {"kernel": dg_in("q")},
            "k": {"kernel": dg_in("k")},
            "v": {"kernel": dg_in("v")},
            "o": {"kernel": o},
        }

    def ff(p):
        out = {"wo": {"kernel": sd[f"{p}.wo.weight"].T}}
        if cfg.is_gated:
            out["wi_0"] = {"kernel": sd[f"{p}.wi_0.weight"].T}
            out["wi_1"] = {"kernel": sd[f"{p}.wi_1.weight"].T}
        else:
            out["wi"] = {"kernel": sd[f"{p}.wi.weight"].T}
        return out

    block = {
        "self_attn": attn(f"{prefix}.layer.0.SelfAttention"),
        "self_attn_ln": {"weight": sd[f"{prefix}.layer.0.layer_norm.weight"]},
    }
    if is_decoder:
        block["cross_attn"] = attn(f"{prefix}.layer.1.EncDecAttention")
        block["cross_attn_ln"] = {"weight": sd[f"{prefix}.layer.1.layer_norm.weight"]}
        block["ff"] = ff(f"{prefix}.layer.2.DenseReluDense")
        block["ff_ln"] = {"weight": sd[f"{prefix}.layer.2.layer_norm.weight"]}
    else:
        block["ff"] = ff(f"{prefix}.layer.1.DenseReluDense")
        block["ff_ln"] = {"weight": sd[f"{prefix}.layer.1.layer_norm.weight"]}
    return block


def convert_t5_encoder_state_dict(sd: Dict[str, np.ndarray], cfg: T5Config) -> Dict[str, Any]:
    """HF T5EncoderModel/T5Model state dict → T5Encoder params."""
    params: Dict[str, Any] = {
        "shared": {"embedding": sd["shared.weight"] if "shared.weight" in sd else sd["encoder.embed_tokens.weight"]},
        "rel_bias": sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
        "final_ln": {"weight": sd["encoder.final_layer_norm.weight"]},
    }
    for i in range(cfg.num_layers):
        params[f"layer_{i}"] = _t5_block_params(sd, f"encoder.block.{i}", cfg, is_decoder=False)
    return params


def convert_t5_encdec_state_dict(sd: Dict[str, np.ndarray], cfg: T5Config) -> Dict[str, Any]:
    """HF T5ForConditionalGeneration/T5Model state dict → T5EncoderDecoderStep params."""
    params: Dict[str, Any] = {
        "shared": {"embedding": sd["shared.weight"]},
        "enc_rel_bias": sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
        "dec_rel_bias": sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
        "enc_final_ln": {"weight": sd["encoder.final_layer_norm.weight"]},
        "dec_final_ln": {"weight": sd["decoder.final_layer_norm.weight"]},
    }
    for i in range(cfg.num_layers):
        params[f"enc_layer_{i}"] = _t5_block_params(sd, f"encoder.block.{i}", cfg, is_decoder=False)
    for i in range(cfg.num_decoder_layers):
        params[f"dec_layer_{i}"] = _t5_block_params(sd, f"decoder.block.{i}", cfg, is_decoder=True)
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": sd["lm_head.weight"].T}
    return params


def load_t5_encoder(model_name_or_path: str, cache_dir: Optional[str] = None) -> Tuple[T5Config, Dict[str, Any]]:
    from .hf_convert import _load_state_dict

    sd, hf_config = _load_state_dict(model_name_or_path, cache_dir)
    cfg = T5Config.from_hf_config(hf_config)
    return cfg, convert_t5_encoder_state_dict(sd, cfg)


def load_t5_encdec(model_name_or_path: str, cache_dir: Optional[str] = None) -> Tuple[T5Config, Dict[str, Any]]:
    from .hf_convert import _load_state_dict

    sd, hf_config = _load_state_dict(model_name_or_path, cache_dir)
    cfg = T5Config.from_hf_config(hf_config)
    return cfg, convert_t5_encdec_state_dict(sd, cfg)
