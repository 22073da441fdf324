"""Cross-encoder reranking runtime over TREC runs.

Reference: Reranker + RRPredictDataset
(/root/reference/src/openmatch/retriever/reranker.py:23-131): for each
(qid, did) in the run, tokenize query+doc, score in batches (2-column
outputs log-softmaxed to log P(relevant), :114-115), merge into a new run.

Redesign: pair generation is a host generator feeding fixed-shape batches
into one jitted score fn; no per-rank temp trec files — sharding (if any)
happens upstream in the run split.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DataArguments, InferenceArguments
from ..data.collators import pad_ids
from ..data.loader import prefetch
from ..models.rr_model import RRModel
from ..templates import fill_template, find_all_markers

logger = logging.getLogger(__name__)

RankResult = Dict[str, Dict[str, float]]


def device_pair_len(max_len: int, max_positions: Optional[int] = None) -> int:
    """DEVICE pad length for cross-encoder pairs: ``max_len`` rounded up
    to a 128-lane multiple. A [*, S] activation with S % 128 != 0 pays
    partial-tile waste in every matmul; measured on v5e (BERT-base,
    B=512, rerank_bench.py): S=192 scores a batch in 297 ms while S=256
    — MORE tokens — takes 238 ms. Tokenization still truncates at
    ``max_len``; only the pad target widens (pad positions are masked,
    scores unchanged).

    ``max_positions`` caps the widening at the encoder's absolute
    position table (BERT): position ids beyond it gather NaN rows
    (flax Embed fill mode) that poison every attention row through the
    additive mask. If the aligned target does not fit, the raw length is
    kept. T5 (relative positions) has no cap."""
    n = -(-max_len // 128) * 128
    if max_positions is not None and n > max_positions:
        return max_len
    return n


def _model_max_positions(model) -> Optional[int]:
    """Absolute-position capacity of an RRModel's encoder, or None when
    positions are unbounded (T5 relative bias)."""
    return getattr(model.encoder_config, "max_position_embeddings", None)


def encode_pair(tokenizer, qry, doc, max_len: int):
    """(input_ids, token_type_ids) for a (query, doc) pair
    (reference reranker.py:23-29 + BERT segment semantics)."""
    from ..data.tokenization import encode_pair_with_segments

    return encode_pair_with_segments(tokenizer, qry, doc, max_len)


class Reranker:
    def __init__(
        self,
        model: RRModel,
        params,
        tokenizer,
        data_args: DataArguments,
        inference_args: InferenceArguments,
        mesh=None,
        axis: str = "data",
    ):
        """``mesh``: optional device mesh for data-parallel scoring — the
        pair batch is sharded over ``axis`` (batch rows split across
        chips, params replicated), the reference's multi-GPU rerank shape
        (reranker.py:93-100 IterableDatasetShard) as one SPMD program
        instead of per-rank processes + trec-file merges. The global
        batch is per_device_eval_batch_size x axis size."""
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.data_args = data_args
        self.args = inference_args
        self.mesh = mesh
        self.axis = axis
        self.batch_size = inference_args.per_device_eval_batch_size * (
            mesh.shape[axis] if mesh is not None else 1)
        self.max_len = data_args.q_max_len + data_args.p_max_len + 2
        self.device_len = device_pair_len(self.max_len,
                                          _model_max_positions(model))
        # ascending device pad lengths: short pairs route to the smallest
        # 128-aligned graph that fits them (a [B, 128] cross-encoder batch
        # scores ~2x faster than [B, 256]; most MS MARCO pairs tokenize
        # under 128). Degenerates to [device_len] when alignment is capped.
        if self.device_len % 128 == 0 and self.device_len > 128:
            self.bucket_lens = list(range(128, self.device_len + 1, 128))
        else:
            self.bucket_lens = [self.device_len]

        @jax.jit
        def _score(params, input_ids, attention_mask, token_type_ids):
            s = model.score(params, input_ids, attention_mask, token_type_ids)
            return model.relevance_logprob(s)

        self._score = _score

    def _shard_batch(self, arr: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            arr, NamedSharding(self.mesh, P(self.axis, None)))

    def _pair_stream(
        self,
        queries: Dict[str, dict],
        corpus: Dict[str, dict],
        run: Dict[str, Dict[str, float]],
    ) -> Iterator[dict]:
        """(qid, did, tokenized pair) stream from a run dict
        (reference RRPredictDataset.__iter__ :54-69)."""
        q_template = self.data_args.query_template
        d_template = self.data_args.doc_template
        q_markers = find_all_markers(q_template) if q_template else None
        d_markers = find_all_markers(d_template) if d_template else None
        for qid, docs in run.items():
            if qid not in queries:
                continue
            query_text = (
                fill_template(q_template, queries[qid], q_markers, allow_not_found=True)
                if q_template else queries[qid].get("text", "")
            )
            for did in docs:
                if did not in corpus:
                    continue
                doc_text = (
                    fill_template(d_template, corpus[did], d_markers, allow_not_found=True)
                    if d_template else corpus[did].get("text", "")
                )
                ids, segs = encode_pair(self.tokenizer, query_text, doc_text, self.max_len)
                yield {"qid": qid, "did": did, "input_ids": ids, "token_type_ids": segs}

    def rerank(
        self,
        queries: Dict[str, dict],
        corpus: Dict[str, dict],
        run: Dict[str, Dict[str, float]],
        depth: Optional[int] = None,
    ) -> RankResult:
        """Re-score the top ``depth`` docs of each query in ``run``."""
        if depth is not None:
            run = {
                qid: dict(sorted(docs.items(), key=lambda kv: kv[1], reverse=True)[:depth])
                for qid, docs in run.items()
            }
        pad_id = self.tokenizer.pad_token_id or 0

        def collate(features, pad_len):
            keys = [(f["qid"], f["did"]) for f in features]
            batch = pad_ids([f["input_ids"] for f in features],
                            pad_len, pad_id)
            segs = np.zeros_like(batch["input_ids"])
            for i, f in enumerate(features):
                s = f["token_type_ids"][: self.max_len]
                segs[i, : len(s)] = s
            batch["token_type_ids"] = segs
            return keys, batch

        def bucketed():
            """Length-bucketed batches: each pair goes to the smallest
            bucket pad length that fits it; a bucket flushes when it
            reaches batch_size, remainders flush (padded to full) at
            stream end. Shapes stay static — one compiled graph per
            bucket length — and result order is irrelevant (scores merge
            into the run dict by (qid, did))."""
            buf: Dict[int, list] = {b: [] for b in self.bucket_lens}
            for f in self._pair_stream(queries, corpus, run):
                b = next(x for x in self.bucket_lens
                         if x >= len(f["input_ids"]))
                buf[b].append(f)
                if len(buf[b]) == self.batch_size:
                    yield collate(buf[b], b), self.batch_size
                    buf[b] = []
            for b in self.bucket_lens:
                if buf[b]:
                    n_valid = len(buf[b])
                    fs = buf[b] + [buf[b][-1]] * (self.batch_size - n_valid)
                    yield collate(fs, b), n_valid

        result: RankResult = {}
        for (keys, batch), n_valid in prefetch(bucketed(), depth=4):
            scores = self._score(
                self.params,
                self._shard_batch(jnp.asarray(batch["input_ids"])),
                self._shard_batch(jnp.asarray(batch["attention_mask"])),
                self._shard_batch(jnp.asarray(batch["token_type_ids"])),
            )
            scores = np.asarray(scores, np.float32)[:n_valid]
            for (qid, did), s in zip(keys[:n_valid], scores):
                result.setdefault(qid, {})[did] = float(s)
        return result
