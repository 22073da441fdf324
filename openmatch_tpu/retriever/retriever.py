"""Dense retrieval runtime: encode corpus + queries, exact top-k, TREC out.

Reference Retriever/SuccessiveRetriever
(/root/reference/src/openmatch/retriever/dense_retriever.py:25-236), rebuilt
on the TPU MIPS engine (ops/mips.py) instead of faiss:

- ``Retriever``: whole index resident (optionally sharded over the mesh),
  one search call per query batch.
- ``SuccessiveRetriever``: embedding shards streamed from disk one at a
  time, per-shard top-k merged by score — bounded memory for indexes larger
  than HBM (reference :219-236 semantics via
  utils.merge_retrieval_results_by_score).
"""

from __future__ import annotations

import gc
import logging
from typing import Dict, Iterable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import DataArguments, InferenceArguments
from ..models.dr_model import DRModel
from ..ops.mips import Searcher, exact_search
from ..utils.trec import merge_retrieval_results_by_score
from .encoder import encode_dataset, list_shards, load_embeddings, save_embeddings, shard_path

logger = logging.getLogger(__name__)

RankResult = Dict[str, Dict[str, float]]


def _to_result(
    scores: np.ndarray, indices: np.ndarray, qids: List[str], doc_ids: List[str]
) -> RankResult:
    out: RankResult = {}
    for r, qid in enumerate(qids):
        row = {}
        for s, i in zip(scores[r], indices[r]):
            if np.isfinite(s):
                row[doc_ids[int(i)]] = float(s)
        out[qid] = row
    return out


class Retriever:
    def __init__(
        self,
        model: DRModel,
        params,
        data_args: DataArguments,
        inference_args: InferenceArguments,
        pad_token_id: int,
        mesh: Optional[Mesh] = None,
    ):
        self.model = model
        self.params = params
        self.data_args = data_args
        self.args = inference_args
        self.pad_token_id = pad_token_id
        self.mesh = mesh
        self.doc_embeddings: Optional[np.ndarray] = None
        self.doc_ids: List[str] = []
        self._corpus_gen = 0  # bumped on corpus (re)assignment

    # ---- corpus side ---------------------------------------------------

    def encode_corpus(self, corpus_dataset: Iterable[dict], save_dir: Optional[str] = None,
                      shard_index: int = 0) -> Tuple[np.ndarray, List[str]]:
        emb, ids = encode_dataset(
            self.model, self.params, corpus_dataset,
            batch_size=self.args.per_device_eval_batch_size,
            max_len=self.data_args.p_max_len,
            pad_token_id=self.pad_token_id,
            is_query=False,
        )
        if save_dir:
            save_embeddings(emb, ids, shard_path(save_dir, "corpus", shard_index),
                            num_shards=getattr(self.data_args,
                                               "encode_num_shard", None))
        self.doc_embeddings, self.doc_ids = emb, ids
        self._corpus_gen += 1  # invalidate the cached Searcher
        return emb, ids

    def load_corpus_shards(self, save_dir: str):
        embs, ids = [], []
        for path in list_shards(save_dir, "corpus"):
            e, i = load_embeddings(path)
            embs.append(e)
            ids.extend(i)
        self.doc_embeddings = np.concatenate(embs, axis=0)
        self.doc_ids = ids
        self._corpus_gen += 1  # invalidate the cached Searcher
        return self.doc_embeddings, self.doc_ids

    # ---- query side ----------------------------------------------------

    def encode_queries(self, query_dataset: Iterable[dict], save_dir: Optional[str] = None,
                       shard_index: int = 0) -> Tuple[np.ndarray, List[str]]:
        emb, ids = encode_dataset(
            self.model, self.params, query_dataset,
            batch_size=self.args.per_device_eval_batch_size,
            max_len=self.data_args.q_max_len,
            pad_token_id=self.pad_token_id,
            is_query=True,
        )
        if save_dir:
            save_embeddings(emb, ids, shard_path(save_dir, "query", shard_index),
                            num_shards=getattr(self.data_args,
                                               "encode_num_shard", None))
        return emb, ids

    # ---- search --------------------------------------------------------

    def search(self, q_embeddings: np.ndarray, qids: List[str], topk: int = 100,
               search_dtype=jnp.bfloat16) -> RankResult:
        assert self.doc_embeddings is not None, "encode or load the corpus first"
        # the built Searcher IS the index (prepared layout, device
        # placement); rebuilding per call would re-pad and re-upload the
        # whole corpus each query batch — cache until the corpus or the
        # requested depth changes (ANCE loops call search() per batch)
        key = (self._corpus_gen, topk, search_dtype)
        if getattr(self, "_searcher_key", None) != key:
            # release the stale index BEFORE building the replacement:
            # holding both (ANCE re-encode loops) doubles the resident
            # index, and over-ceiling HBM allocations through the tunnel
            # HANG rather than raise
            self._searcher = None
            self._searcher_key = None
            # dtype-cast on the HOST: the Searcher's mesh branches place
            # the index themselves (sharded/replicated device_put); a
            # jnp.asarray here would first stage the full corpus on ONE
            # device — at 8.8M docs a 12.65 GiB single-chip allocation
            # held alongside the mesh placement (serve.py documents the
            # same hazard)
            import ml_dtypes

            host_dtype = ml_dtypes.bfloat16 \
                if search_dtype == jnp.bfloat16 else np.dtype(search_dtype)
            host_emb = np.asarray(self.doc_embeddings).astype(
                host_dtype, copy=False)
            self._searcher = Searcher(
                host_emb, k=topk,
                mesh=self.mesh,
                method=getattr(self.args, "search_method", "auto"),
                # "queries" replicates the index per chip and splits query
                # batches (no collectives) — the fast shape when the corpus
                # fits each chip's HBM; "docs" row-shards the corpus
                partition=getattr(self.args, "search_partition", "docs"),
                n_segs=getattr(self.args, "search_n_segs", 1),
            )
            self._searcher_key = key
        scores, indices = self._searcher.search(
            jnp.asarray(q_embeddings, search_dtype))
        return _to_result(np.asarray(scores), np.asarray(indices), qids, self.doc_ids)

    def retrieve(self, query_dataset: Iterable[dict], topk: int = 100) -> RankResult:
        q_emb, qids = self.encode_queries(query_dataset)
        # reference frees the model before faiss search (:194-206); on TPU the
        # encoder params and index coexist in HBM unless the corpus is huge.
        return self.search(q_emb, qids, topk)

    # ---- classmethod layout mirroring the reference API ---------------

    @classmethod
    def build_all(cls, model, params, corpus_dataset, data_args, inference_args,
                  pad_token_id, mesh=None) -> "Retriever":
        r = cls(model, params, data_args, inference_args, pad_token_id, mesh)
        r.encode_corpus(corpus_dataset, save_dir=inference_args.encoded_save_path)
        return r

    @classmethod
    def build_embeddings(cls, model, params, corpus_dataset, data_args, inference_args,
                         pad_token_id, shard_index: int = 0, mesh=None) -> "Retriever":
        r = cls(model, params, data_args, inference_args, pad_token_id, mesh)
        r.encode_corpus(corpus_dataset, save_dir=inference_args.encoded_save_path,
                        shard_index=shard_index)
        return r

    @classmethod
    def from_embeddings(cls, model, params, data_args, inference_args,
                        pad_token_id, mesh=None) -> "Retriever":
        r = cls(model, params, data_args, inference_args, pad_token_id, mesh)
        r.load_corpus_shards(inference_args.encoded_save_path)
        return r


class SuccessiveRetriever(Retriever):
    """Partition-at-a-time search for indexes larger than device memory.

    Reference semantics at dense_retriever.py:219-236: load one embedding
    partition, search it, merge by score, free, repeat.
    """

    @classmethod
    def from_embeddings(cls, model, params, data_args, inference_args,
                        pad_token_id, mesh=None) -> "SuccessiveRetriever":
        # deliberately do NOT load shards into memory — that's the point
        return cls(model, params, data_args, inference_args, pad_token_id, mesh)

    def retrieve(self, query_dataset: Iterable[dict], topk: int = 100) -> RankResult:
        q_emb, qids = self.encode_queries(query_dataset)
        return self.search_partitions(q_emb, qids, topk)

    def search_partitions(self, q_embeddings: np.ndarray, qids: List[str],
                          topk: int = 100, search_dtype=jnp.bfloat16) -> RankResult:
        save_dir = self.args.encoded_save_path
        partial_results = []
        q = jnp.asarray(q_embeddings, search_dtype)
        for path in list_shards(save_dir, "corpus"):
            emb, ids = load_embeddings(path)
            scores, indices = exact_search(q, jnp.asarray(emb, search_dtype), k=min(topk, len(ids)))
            partial_results.append(
                _to_result(np.asarray(scores), np.asarray(indices), qids, ids)
            )
            del emb
            gc.collect()
        return merge_retrieval_results_by_score(partial_results, topk)
