"""Bi-encoder dense retrieval model (DRModel), TPU-native.

Functional re-design of the reference DRModel
(/root/reference/src/openmatch/modeling/dense_retrieval_model.py:36-282):

- tied or untied query/passage towers (untied = two param trees)
- pooling first/mean over ``last_hidden_state``; optional bias-free linear
  head; optional L2 normalization (reference :133-155)
- the in-batch contrastive loss with positives at stride
  ``train_n_passages`` (reference :113-122)
- persistence via an ``openmatch_config.json`` sidecar plus msgpack params,
  with tied/untied directory layout mirroring the reference (:230-245)

Instead of an ``nn.Module`` with mutable state, DRModel here is a thin
descriptor holding configs; parameters travel explicitly (pytrees), so the
same apply functions serve training (grad), inference (no grad), and
GradCache chunked replay without ``@torch.no_grad`` ceremony.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.core import freeze, unfreeze

from ..config import ModelArguments, resolve_dtype
from .bert import BertConfig, BertEncoder
from .pooling import LinearHead, pool_hidden

OPENMATCH_CONFIG = "openmatch_config.json"


@dataclass
class DRModel:
    """Descriptor + pure apply functions for a dual-encoder."""

    encoder_config: Any  # BertConfig or T5Config
    # "bert" | "t5" (encoder-only, the reference's --encoder_only / GTR
    # path) | "t5_encdec" (full T5: the rep is DECODER token 0's hidden
    # state from one decoder step fed decoder_input_ids=0 — the
    # reference's DEFAULT T5 DR semantics, dense_retrieval_model.py:137-141)
    backbone_type: str = "bert"
    tied: bool = True
    feature: str = "last_hidden_state"
    pooling: str = "first"
    normalize: bool = False
    has_head: bool = False
    head_in_dim: int = 768
    head_out_dim: int = 768
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.backbone_type == "bert":
            self._encoder = BertEncoder(self.encoder_config, dtype=self.dtype)
        elif self.backbone_type == "t5":
            from .t5 import T5Encoder

            self._encoder = T5Encoder(self.encoder_config, dtype=self.dtype)
        elif self.backbone_type == "t5_encdec":
            from .t5 import T5EncoderDecoderStep

            self._encoder = T5EncoderDecoderStep(self.encoder_config,
                                                 dtype=self.dtype)
        else:
            raise ValueError(f"Unknown backbone type {self.backbone_type}")
        if self.has_head:
            self._head = LinearHead(self.head_in_dim, self.head_out_dim, dtype=self.dtype)

    @property
    def dropout_active(self) -> bool:
        """True when the encoder config carries nonzero dropout rates (the
        train step then threads a per-step RNG; inference never does)."""
        c = self.encoder_config
        return bool(
            getattr(c, "hidden_dropout_prob", 0.0)
            or getattr(c, "attention_probs_dropout_prob", 0.0)
            or getattr(c, "dropout_rate", 0.0)
        )

    # ---- parameter initialization -------------------------------------

    def init_params(self, rng: jax.Array, seq_len: int = 8) -> Dict[str, Any]:
        """Initialize a fresh param tree (for tests / from-scratch training)."""
        ids = jnp.zeros((1, seq_len), jnp.int32)
        mask = jnp.ones((1, seq_len), jnp.int32)
        r_q, r_p, r_hq, r_hp = jax.random.split(rng, 4)
        enc_q = self._encoder.init(r_q, ids, mask)["params"]
        params = {"encoder_q": enc_q}
        if not self.tied:
            params["encoder_p"] = self._encoder.init(r_p, ids, mask)["params"]
        if self.has_head:
            reps = jnp.zeros((1, self.head_in_dim), self.dtype)
            params["head_q"] = self._head.init(r_hq, reps)["params"]
            if not self.tied:
                params["head_p"] = self._head.init(r_hp, reps)["params"]
        return params

    # ---- encoding ------------------------------------------------------

    def _tower(self, params: Dict[str, Any], is_query: bool) -> Tuple[Any, Any]:
        enc_key = "encoder_q" if (is_query or self.tied) else "encoder_p"
        head_key = "head_q" if (is_query or self.tied) else "head_p"
        return params[enc_key], params.get(head_key)

    def encode(
        self,
        params: Dict[str, Any],
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        is_query: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Encode a batch of token ids to representations [B, D].

        ``dropout_rng``: when given, the encoder runs in training mode
        (deterministic=False) with HF-config dropout rates (reference
        trains through stock AutoModel checkpoints carrying ~0.1,
        dense_retrieval_model.py:173); omitted (inference and the
        parity tests) the graph is the exact dropout-free one."""
        enc_params, head_params = self._tower(params, is_query)
        if dropout_rng is not None:
            outputs = self._encoder.apply(
                {"params": enc_params}, input_ids, attention_mask,
                deterministic=False, rngs={"dropout": dropout_rng})
        else:
            outputs = self._encoder.apply({"params": enc_params}, input_ids, attention_mask)
        if self.backbone_type == "t5_encdec":
            # full-T5 rep: decoder token 0's hidden state, bypassing the
            # pooling config exactly like the reference
            # (dense_retrieval_model.py:137-141 takes hidden[:, 0] of the
            # single decoder step regardless of --pooling)
            reps = outputs["decoder_hidden"][:, 0, :]
        else:
            hidden = outputs[self.feature]
            reps = pool_hidden(hidden, attention_mask, self.pooling)
        if self.has_head:
            reps = self._head.apply({"params": head_params}, reps)
        if self.normalize:
            reps = reps / jnp.linalg.norm(reps, axis=-1, keepdims=True).clip(1e-12)
        return reps

    def encode_query(self, params, input_ids, attention_mask, dropout_rng=None):
        return self.encode(params, input_ids, attention_mask, is_query=True,
                           dropout_rng=dropout_rng)

    def encode_passage(self, params, input_ids, attention_mask, dropout_rng=None):
        return self.encode(params, input_ids, attention_mask, is_query=False,
                           dropout_rng=dropout_rng)

    # ---- construction --------------------------------------------------

    @classmethod
    def build(
        cls,
        model_args: ModelArguments,
        train_args=None,
    ) -> Tuple["DRModel", Dict[str, Any]]:
        """Load from an OpenMatch-TPU checkpoint dir (openmatch_config.json
        present) or convert a raw HF checkpoint — mirror of reference
        DRModel.build (:163-228)."""
        path = model_args.model_name_or_path
        dtype = resolve_dtype(model_args.dtype)
        om_cfg_path = os.path.join(path, OPENMATCH_CONFIG) if os.path.isdir(path) else None
        if om_cfg_path and os.path.exists(om_cfg_path):
            return cls.load(path, dtype=dtype)

        # raw HF checkpoint
        from .hf_convert import load_bert_encoder

        if _looks_like_t5(path):
            # reference dispatch (dense_retrieval_model.py:129-141): the
            # DEFAULT T5 DR runs the full encoder-decoder and takes the
            # decoder-token-0 rep; --encoder_only (the GTR recipe) uses
            # the encoder stack with the configured pooling
            if model_args.encoder_only:
                from .t5 import load_t5_encoder

                enc_config, enc_params = load_t5_encoder(
                    path, cache_dir=model_args.cache_dir)
                backbone = "t5"
            else:
                from .t5 import load_t5_encdec

                enc_config, enc_params = load_t5_encdec(
                    path, cache_dir=model_args.cache_dir)
                backbone = "t5_encdec"
        else:
            enc_config, enc_params = load_bert_encoder(path, cache_dir=model_args.cache_dir)
            backbone = "bert"

        tied = not model_args.untie_encoder
        model = cls(
            encoder_config=enc_config,
            backbone_type=backbone,
            tied=tied,
            feature=model_args.feature,
            pooling=model_args.pooling,
            normalize=model_args.normalize,
            has_head=model_args.add_linear_head,
            head_in_dim=model_args.projection_in_dim,
            head_out_dim=model_args.projection_out_dim,
            dtype=dtype,
        )
        params: Dict[str, Any] = {"encoder_q": jax.tree.map(jnp.asarray, enc_params)}
        if not tied:
            params["encoder_p"] = jax.tree.map(jnp.asarray, enc_params)
        if model.has_head:
            rng = jax.random.PRNGKey(0)
            reps = jnp.zeros((1, model.head_in_dim), dtype)
            params["head_q"] = model._head.init(rng, reps)["params"]
            if not tied:
                params["head_p"] = jax.tree.map(jnp.copy, params["head_q"])
        return model, params

    # ---- persistence ---------------------------------------------------

    def config_dict(self) -> Dict[str, Any]:
        return {
            "tied": self.tied,
            "plm_backbone": {"type": self.backbone_type, "feature": self.feature},
            "pooling": self.pooling,
            "linear_head": self.has_head,
            "normalize": self.normalize,
            "head_in_dim": self.head_in_dim,
            "head_out_dim": self.head_out_dim,
            "encoder_config": _config_to_dict(self.encoder_config),
        }

    def save(self, params: Dict[str, Any], output_dir: str):
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, OPENMATCH_CONFIG), "w") as f:
            json.dump(self.config_dict(), f, indent=4)
        params = jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), unfreeze(params) if hasattr(params, "unfreeze") else params)
        with open(os.path.join(output_dir, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(params))

    @classmethod
    def load(cls, ckpt_dir: str, dtype=jnp.float32) -> Tuple["DRModel", Dict[str, Any]]:
        with open(os.path.join(ckpt_dir, OPENMATCH_CONFIG)) as f:
            cfg = json.load(f)
        backbone = cfg["plm_backbone"]["type"]
        enc_config = _config_from_dict(backbone, cfg["encoder_config"])
        model = cls(
            encoder_config=enc_config,
            backbone_type=backbone,
            tied=cfg["tied"],
            feature=cfg["plm_backbone"]["feature"],
            pooling=cfg["pooling"],
            normalize=cfg["normalize"],
            has_head=cfg["linear_head"],
            head_in_dim=cfg.get("head_in_dim", 768),
            head_out_dim=cfg.get("head_out_dim", 768),
            dtype=dtype,
        )
        with open(os.path.join(ckpt_dir, "params.msgpack"), "rb") as f:
            params = serialization.msgpack_restore(f.read())
        params = jax.tree.map(jnp.asarray, params)
        return model, params


def _looks_like_t5(path: str) -> bool:
    name = os.path.basename(path.rstrip("/")).lower()
    if "t5" in name or "gtr" in name:
        return True
    cfg_path = os.path.join(path, "config.json")
    if os.path.isdir(path) and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            return json.load(f).get("model_type") == "t5"
    return False


def _config_to_dict(config) -> Dict[str, Any]:
    return config.to_dict()


def _config_from_dict(backbone: str, d: Dict[str, Any]):
    if backbone == "bert":
        return BertConfig(**d)
    from .t5 import T5Config

    return T5Config(**d)
