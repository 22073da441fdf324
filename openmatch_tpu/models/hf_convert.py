"""HuggingFace PyTorch checkpoint → OpenMatch-TPU Flax params.

Required to start from public bert-base / roberta / electra / t5 checkpoints
and hit reference accuracy (SURVEY.md §7 "HF checkpoint interop"). Loads the
torch state dict on CPU, converts to numpy, and maps keys into our from-
scratch module trees. No torch tensors ever reach the device path.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .bert import BertConfig

logger = logging.getLogger(__name__)


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _load_state_dict(model_name_or_path: str, cache_dir: Optional[str] = None) -> Tuple[Dict[str, np.ndarray], Any]:
    """Return (numpy state dict, hf config) for a HF hub id or local dir."""
    import torch
    from transformers import AutoConfig

    hf_config = AutoConfig.from_pretrained(model_name_or_path, cache_dir=cache_dir)
    import os

    sd = None
    if os.path.isdir(model_name_or_path):
        for fname, loader in (
            ("model.safetensors", "safetensors"),
            ("pytorch_model.bin", "torch"),
        ):
            path = os.path.join(model_name_or_path, fname)
            if os.path.exists(path):
                if loader == "safetensors":
                    from safetensors.torch import load_file

                    sd = load_file(path)
                else:
                    sd = torch.load(path, map_location="cpu", weights_only=True)
                break
    if sd is None:
        from transformers import AutoModel

        model = AutoModel.from_pretrained(model_name_or_path, cache_dir=cache_dir)
        sd = model.state_dict()
    return {k: _np(v) for k, v in sd.items()}, hf_config


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop the leading model-type prefix (bert./roberta./electra./model.).

    distilbert is deliberately NOT listed: its layer keys
    (transformer.layer.N.attention.q_lin.*) and config fields differ from
    the BERT layout entirely — listing the prefix would advertise a
    conversion that fails on the first layer key."""
    prefixes = ("bert.", "roberta.", "electra.", "model.")
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def convert_bert_state_dict(
    sd: Dict[str, np.ndarray], config: BertConfig
) -> Dict[str, Any]:
    """Map a HF BERT/RoBERTa/ELECTRA state dict onto our BertEncoder tree.

    HF Linear stores [out, in]; Flax Dense expects [in, out] — transpose.
    The fused QKV kernel is the concat of HF's q/k/v projections reshaped to
    [d, 3, heads, head_dim].
    """
    sd = _strip_prefix(sd)
    d = config.hidden_size
    n_heads = config.num_attention_heads
    head_dim = d // n_heads
    emb_dim = config.embedding_size or d

    params: Dict[str, Any] = {}

    def dense(prefix: str) -> Dict[str, np.ndarray]:
        return {
            "kernel": sd[f"{prefix}.weight"].T,
            "bias": sd[f"{prefix}.bias"],
        }

    def layernorm(prefix: str) -> Dict[str, np.ndarray]:
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params["word_embeddings"] = {"embedding": sd["embeddings.word_embeddings.weight"]}
    params["position_embeddings"] = {
        "embedding": sd["embeddings.position_embeddings.weight"]
    }
    if "embeddings.token_type_embeddings.weight" in sd:
        params["token_type_embeddings"] = {
            "embedding": sd["embeddings.token_type_embeddings.weight"]
        }
    else:  # BERT-layout checkpoints shipped without segment embeddings
        params["token_type_embeddings"] = {
            "embedding": np.zeros((config.type_vocab_size, emb_dim), np.float32)
        }
    params["embeddings_ln"] = layernorm("embeddings.LayerNorm")
    if config.embedding_size and config.embedding_size != d:
        params["embeddings_project"] = dense("embeddings_project")

    for i in range(config.num_hidden_layers):
        p = f"encoder.layer.{i}"
        q_w = sd[f"{p}.attention.self.query.weight"].T  # [d, d]
        k_w = sd[f"{p}.attention.self.key.weight"].T
        v_w = sd[f"{p}.attention.self.value.weight"].T
        qkv_kernel = np.stack([q_w, k_w, v_w], axis=1)  # [d, 3, d]
        qkv_kernel = qkv_kernel.reshape(d, 3, n_heads, head_dim)
        q_b = sd[f"{p}.attention.self.query.bias"]
        k_b = sd[f"{p}.attention.self.key.bias"]
        v_b = sd[f"{p}.attention.self.value.bias"]
        qkv_bias = np.stack([q_b, k_b, v_b], axis=0).reshape(3, n_heads, head_dim)

        out_kernel = sd[f"{p}.attention.output.dense.weight"].T  # [d, d]
        out_kernel = out_kernel.reshape(n_heads, head_dim, d)

        params[f"layer_{i}"] = {
            "attention": {
                "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                "out": {
                    "kernel": out_kernel,
                    "bias": sd[f"{p}.attention.output.dense.bias"],
                },
            },
            "attention_ln": layernorm(f"{p}.attention.output.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "output_ln": layernorm(f"{p}.output.LayerNorm"),
        }

    if config.add_pooler and "pooler.dense.weight" in sd:
        params["pooler"] = dense("pooler.dense")
    return params


def load_bert_encoder(
    model_name_or_path: str, cache_dir: Optional[str] = None
) -> Tuple[BertConfig, Dict[str, Any]]:
    """One-call loader: HF id/dir → (BertConfig, Flax params)."""
    sd, hf_config = _load_state_dict(model_name_or_path, cache_dir)
    config = BertConfig.from_hf_config(hf_config)
    params = convert_bert_state_dict(sd, config)
    return config, params
