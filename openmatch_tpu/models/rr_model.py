"""Cross-encoder reranking model (RRModel), TPU-native.

Functional re-design of the reference RRModel
(/root/reference/src/openmatch/modeling/reranking_model.py:34-181):

- BERT path: pooled rep → bias-free LinearHead(hidden, 1) score (:116-124).
- monoT5 path: one decoder step, score = logits at [neg_token, pos_token]
  (:110-114); loss forced to 2-class CE (:71-73).
- Pairwise training over pos_pairs/neg_pairs with the mr/smr/bce/ce registry.
- Persistence mirrors DRModel's sidecar layout (:176-181).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..config import ModelArguments, TrainingArguments, resolve_dtype
from ..losses import rr_loss_functions
from .bert import BertConfig, BertEncoder
from .dr_model import OPENMATCH_CONFIG, _looks_like_t5
from .pooling import LinearHead, pool_hidden


@dataclass
class RRModel:
    encoder_config: Any
    backbone_type: str = "bert"  # "bert" | "t5" (monoT5) | "t5enc"
    feature: str = "last_hidden_state"
    pooling: str = "first"
    pos_token_id: Optional[int] = None
    neg_token_id: Optional[int] = None
    head_in_dim: int = 768
    loss_fn_str: str = "bce"
    margin: float = 1.0
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.backbone_type == "bert":
            self._encoder = BertEncoder(self.encoder_config, dtype=self.dtype)
        elif self.backbone_type == "t5":
            from .t5 import T5EncoderDecoderStep

            self._encoder = T5EncoderDecoderStep(self.encoder_config, dtype=self.dtype)
            self.loss_fn_str = "ce"  # reference :71-73
        elif self.backbone_type == "t5enc":
            from .t5 import T5Encoder

            self._encoder = T5Encoder(self.encoder_config, dtype=self.dtype)
        else:
            raise ValueError(self.backbone_type)
        self._head = LinearHead(self.head_in_dim, 1, dtype=self.dtype)

    @property
    def is_monot5(self) -> bool:
        return self.backbone_type == "t5"

    @property
    def dropout_active(self) -> bool:
        c = self.encoder_config
        return bool(
            getattr(c, "hidden_dropout_prob", 0.0)
            or getattr(c, "attention_probs_dropout_prob", 0.0)
            or getattr(c, "dropout_rate", 0.0)
        )

    # ---- scoring -------------------------------------------------------

    def score(
        self,
        params: Dict[str, Any],
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        token_type_ids: Optional[jnp.ndarray] = None,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Score concatenated (query, passage) pairs.

        Returns [B, 1] (BERT head) or [B, 2] = logits at [neg, pos]
        (monoT5), matching reference shapes. ``dropout_rng`` enables
        HF-config dropout for training (see DRModel.encode)."""
        kwargs = {}
        if dropout_rng is not None:
            kwargs = dict(deterministic=False, rngs={"dropout": dropout_rng})
        if self.is_monot5:
            out = self._encoder.apply({"params": params["encoder"]}, input_ids, attention_mask, **kwargs)
            logits = out["logits"]  # [B, 1, V]
            return logits[:, 0, jnp.array([self.neg_token_id, self.pos_token_id])]
        if self.backbone_type == "bert" and token_type_ids is not None:
            kwargs["token_type_ids"] = token_type_ids
        out = self._encoder.apply({"params": params["encoder"]}, input_ids, attention_mask, **kwargs)
        hidden = out[self.feature]
        reps = pool_hidden(hidden, attention_mask, self.pooling)
        return self._head.apply({"params": params["head"]}, reps)

    def loss(
        self,
        params: Dict[str, Any],
        pos_batch: Dict[str, jnp.ndarray],
        neg_batch: Dict[str, jnp.ndarray],
        dropout_rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        if dropout_rng is not None:
            r_pos, r_neg = jax.random.split(dropout_rng)
            pos_scores = self.score(params, **pos_batch, dropout_rng=r_pos)
            neg_scores = self.score(params, **neg_batch, dropout_rng=r_neg)
        else:
            pos_scores = self.score(params, **pos_batch)
            neg_scores = self.score(params, **neg_batch)
        if self.loss_fn_str == "ce" and pos_scores.shape[-1] != 2:
            # the 2-class CE is defined over [neg, pos] logit pairs (monoT5);
            # a [B, 1] head would silently produce NaN loss
            raise ValueError(
                "loss_fn 'ce' requires 2-column scores (monoT5); this "
                f"backbone produces {pos_scores.shape[-1]}-column scores — "
                "use 'mr', 'smr', or 'bce'."
            )
        fn = rr_loss_functions[self.loss_fn_str]
        if self.loss_fn_str in ("mr", "smr"):
            if pos_scores.ndim == 2 and pos_scores.shape[-1] == 1:
                loss = fn(pos_scores[:, 0], neg_scores[:, 0], margin=self.margin)
            else:
                loss = fn(pos_scores, neg_scores, margin=self.margin)
        elif self.loss_fn_str == "ce":
            loss = fn(pos_scores, neg_scores)
        else:  # bce over scalar scores
            loss = fn(pos_scores[:, 0], neg_scores[:, 0])
        return loss, (pos_scores, neg_scores)

    def relevance_logprob(self, scores: jnp.ndarray) -> jnp.ndarray:
        """Final ranking score: 2-column outputs are log-softmaxed to
        log P(relevant) (reference retriever/reranker.py:114-115); scalar
        outputs pass through."""
        if scores.shape[-1] == 2:
            return jax.nn.log_softmax(scores, axis=-1)[:, 1]
        return scores[:, 0]

    # ---- construction / persistence -----------------------------------

    def init_params(self, rng: jax.Array, seq_len: int = 8) -> Dict[str, Any]:
        ids = jnp.zeros((1, seq_len), jnp.int32)
        mask = jnp.ones((1, seq_len), jnp.int32)
        r_e, r_h = jax.random.split(rng)
        params = {"encoder": self._encoder.init(r_e, ids, mask)["params"]}
        if not self.is_monot5:
            reps = jnp.zeros((1, self.head_in_dim), self.dtype)
            params["head"] = self._head.init(r_h, reps)["params"]
        return params

    @classmethod
    def build(
        cls,
        model_args: ModelArguments,
        train_args: Optional[TrainingArguments] = None,
        tokenizer=None,
    ) -> Tuple["RRModel", Dict[str, Any]]:
        path = model_args.model_name_or_path
        dtype = resolve_dtype(model_args.dtype)
        om_cfg = os.path.join(path, OPENMATCH_CONFIG) if os.path.isdir(path) else None
        if om_cfg and os.path.exists(om_cfg):
            model, params = cls.load(path, dtype=dtype)
        else:
            pos_id = neg_id = None
            if model_args.pos_token and tokenizer is not None:
                def _single_id(token, flag):
                    ids = tokenizer.encode(token, add_special_tokens=False)
                    if len(ids) != 1:
                        raise ValueError(
                            f"{flag}={token!r} tokenizes to {len(ids)} pieces "
                            f"({ids}); monoT5 scoring needs a single-token "
                            "label (reference uses 'true'/'false')")
                    return ids[0]

                pos_id = _single_id(model_args.pos_token, "--pos_token")
                neg_id = _single_id(model_args.neg_token, "--neg_token")
            if model_args.encoder_only:
                from .t5 import load_t5_encoder

                cfg, enc_params = load_t5_encoder(path, model_args.cache_dir)
                backbone, d = "t5enc", cfg.d_model
            elif _looks_like_t5(path):
                from .t5 import load_t5_encdec

                cfg, enc_params = load_t5_encdec(path, model_args.cache_dir)
                backbone, d = "t5", cfg.d_model
            else:
                from .hf_convert import load_bert_encoder

                cfg, enc_params = load_bert_encoder(path, model_args.cache_dir)
                backbone, d = "bert", cfg.hidden_size
            model = cls(
                encoder_config=cfg,
                backbone_type=backbone,
                feature=model_args.feature,
                pooling=model_args.pooling,
                pos_token_id=pos_id,
                neg_token_id=neg_id,
                head_in_dim=model_args.projection_in_dim if backbone == "bert" else d,
                dtype=dtype,
            )
            if model.is_monot5 and (pos_id is None or neg_id is None):
                raise ValueError(
                    "monoT5 reranking scores the decoder logits at the "
                    "[neg, pos] label tokens — pass --pos_token/--neg_token "
                    "(e.g. 'true'/'false', reference reranking_model.py:"
                    "110-114); without them the first score() call would "
                    "fail deep inside tracing")
            params = {"encoder": jax.tree.map(jnp.asarray, enc_params)}
            if not model.is_monot5:
                reps = jnp.zeros((1, model.head_in_dim), dtype)
                params["head"] = model._head.init(jax.random.PRNGKey(0), reps)["params"]
        if train_args is not None and not model.is_monot5:
            model.loss_fn_str = train_args.loss_fn
            model.margin = train_args.margin
        return model, params

    def config_dict(self) -> Dict[str, Any]:
        return {
            "plm_backbone": {"type": self.backbone_type, "feature": self.feature},
            "pooling": self.pooling,
            "pos_token_id": self.pos_token_id,
            "neg_token_id": self.neg_token_id,
            "head_in_dim": self.head_in_dim,
            "encoder_config": self.encoder_config.to_dict(),
        }

    def save(self, params: Dict[str, Any], output_dir: str):
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, OPENMATCH_CONFIG), "w") as f:
            json.dump(self.config_dict(), f, indent=4)
        params = jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), params)
        with open(os.path.join(output_dir, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(params))

    @classmethod
    def load(cls, ckpt_dir: str, dtype=jnp.float32) -> Tuple["RRModel", Dict[str, Any]]:
        with open(os.path.join(ckpt_dir, OPENMATCH_CONFIG)) as f:
            cfg = json.load(f)
        if "tied" in cfg:
            raise ValueError(
                f"{ckpt_dir} is a dense-retrieval (DRModel) checkpoint, not a "
                "reranker; pass it to DRModel/the retrieve drivers instead."
            )
        backbone = cfg["plm_backbone"]["type"]
        if backbone == "bert":
            enc_config = BertConfig(**cfg["encoder_config"])
        else:
            from .t5 import T5Config

            enc_config = T5Config(**cfg["encoder_config"])
        model = cls(
            encoder_config=enc_config,
            backbone_type=backbone,
            feature=cfg["plm_backbone"]["feature"],
            pooling=cfg["pooling"],
            pos_token_id=cfg.get("pos_token_id"),
            neg_token_id=cfg.get("neg_token_id"),
            head_in_dim=cfg.get("head_in_dim", 768),
            dtype=dtype,
        )
        with open(os.path.join(ckpt_dir, "params.msgpack"), "rb") as f:
            params = serialization.msgpack_restore(f.read())
        return model, jax.tree.map(jnp.asarray, params)
