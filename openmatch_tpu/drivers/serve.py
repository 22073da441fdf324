"""Retrieval + rerank serving: hold models + index resident, answer HTTP.

The reference has no serving story (batch TREC runs only); this driver
closes the gap for the production path the framework targets: a DR
checkpoint + corpus embedding shards live in HBM behind a compiled
``Searcher``, an optional cross-encoder (BERT head or monoT5,
retriever/reranker.py semantics) scores (query, doc) pairs, and responses
are JSON.

    python -m openmatch_tpu.drivers.serve \
        --model_name_or_path ckpt_dr --encoded_save_path embeddings/ \
        [--rr_model_name_or_path ckpt_rr] \
        --port 8080 [--retrieve_depth 100] [--max_batch 64]

    GET  /health
    POST /search   {"queries": ["...", ...], "k": 10}
      -> {"results": [[{"id": ..., "score": ...}, ...], ...]}
    POST /rerank   {"query": "...", "docs": [{"id": "d1", "text": "..."}, ...]}
      -> {"results": [{"id": ..., "score": ...}, ...]}   # log P(rel), desc

Either endpoint can run alone: --encoded_save_path enables /search,
--rr_model_name_or_path enables /rerank.

Design notes: one worker thread owns the TPU per service (JAX programs are
not thread-safe to call concurrently); HTTP handlers enqueue and wait.
Inputs are padded into fixed compiled batch shapes so XLA never recompiles
after warmup.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..config import ArgumentParser, DataArguments, InferenceArguments, ModelArguments
from ..models.dr_model import DRModel
from ..ops.mips import Searcher
from .common import load_tokenizer, setup_logging


class OverloadedError(RuntimeError):
    """Bounded request queue is full — callers get HTTP 503, not an
    unbounded memory pile-up."""


class _QueueService:
    """Single-consumer work queue with CROSS-REQUEST COALESCING: one
    thread owns the device per service (JAX programs are not thread-safe
    to call concurrently); concurrent HTTP handlers enqueue and the
    worker gathers whatever arrived — waiting up to ``coalesce_window_s``
    for stragglers while under ``max_batch`` device rows — into one
    fixed-shape dispatch. The queue is bounded (``max_queue`` pending
    requests): beyond it, submitters fail fast with OverloadedError
    (VERDICT r2 weak #8 / next #10).

    Subclasses define ``_rows(args)`` (device rows a request contributes)
    and ``_run_many(requests)`` (batch-execute, one result per request).
    """

    max_queue = 256
    coalesce_window_s = 0.002

    def _start_worker(self):
        self._queue: "queue.Queue" = queue.Queue(maxsize=self.max_queue)
        self.stats = {"dispatch_groups": 0, "requests": 0, "max_coalesced": 0}
        # assign a list to record one dict per dispatch (enqueue-to-
        # dispatch wait, exec wall, host-vs-device split) — the tail
        # root-cause instrument behind scripts/perf/serve_load.py
        self.timeline = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            items = [self._queue.get()]
            deadline = time.monotonic() + self.coalesce_window_s
            while sum(self._rows(args) for args, _, _ in items) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    items.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            self.stats["dispatch_groups"] += 1
            self.stats["requests"] += len(items)
            self.stats["max_coalesced"] = max(self.stats["max_coalesced"], len(items))
            t_exec0 = time.monotonic()
            try:
                self._exec_device_s = 0.0  # _run_many accumulates
                results = self._run_many([args for args, _, _ in items])
                for (_, reply, _), res in zip(items, results):
                    reply.put(("ok", res))
                err = False
            except Exception as e:  # surface errors to every caller
                for _, reply, _ in items:
                    reply.put(("error", str(e)))
                err = True
            if self.timeline is not None:
                t1 = time.monotonic()
                self.timeline.append({
                    "t": t_exec0,
                    "wait_s": t_exec0 - min(enq for _, _, enq in items),
                    "exec_s": t1 - t_exec0,
                    "device_s": self._exec_device_s,
                    "rows": sum(self._rows(args) for args, _, _ in items),
                    "reqs": len(items), "error": err,
                })

    def _submit(self, *args):
        reply: "queue.Queue" = queue.Queue()
        try:
            self._queue.put((args, reply, time.monotonic()), block=False)
        except queue.Full:
            raise OverloadedError(
                f"request queue full ({self.max_queue} pending)")
        status, payload = reply.get()
        if status == "error":
            raise RuntimeError(payload)
        return payload


class RetrievalService(_QueueService):
    """Compiled encode+search behind a single-consumer queue."""

    def __init__(self, model, params, tokenizer, searcher, doc_ids,
                 q_max_len: int, max_batch: int):
        import jax
        import jax.numpy as jnp

        self.tokenizer = tokenizer
        self.doc_ids = doc_ids
        self.searcher = searcher
        self.q_max_len = q_max_len
        self.max_batch = max_batch

        @jax.jit
        def encode(p, ids, mask):
            return model.encode_query(p, ids, mask)

        self._encode = encode
        self._params = params
        self._jnp = jnp
        self._start_worker()

    def warmup(self):
        self.search(["warmup"], k=1)

    @staticmethod
    def _rows(args):
        return len(args[0])

    def _search_rows(self, queries):
        """One device dispatch per max_batch chunk of the merged queries;
        returns (scores [n, K], indices [n, K]) at the searcher's full
        depth (per-request k slicing happens at the split)."""
        from ..data.collators import pad_ids

        jnp = self._jnp
        s_out, i_out = [], []
        for start in range(0, len(queries), self.max_batch):
            chunk = queries[start : start + self.max_batch]
            enc = [
                self.tokenizer.encode_plus(
                    q, truncation="only_first", max_length=self.q_max_len,
                    padding=False, return_attention_mask=False,
                    return_token_type_ids=False,
                )["input_ids"]
                for q in chunk
            ]
            enc = enc + [enc[-1]] * (self.max_batch - len(chunk))  # fixed shape
            batch = pad_ids(enc, self.q_max_len, self.tokenizer.pad_token_id or 0)
            t_dev = time.monotonic()  # device span: upload->encode->search->readback
            reps = self._encode(
                self._params, jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
            )
            scores, indices = self.searcher.search(reps.astype(self.searcher.dtype))
            s_out.append(np.asarray(scores, np.float32)[: len(chunk)])
            i_out.append(np.asarray(indices)[: len(chunk)])
            self._exec_device_s = getattr(self, "_exec_device_s", 0.0) \
                + (time.monotonic() - t_dev)
        return np.concatenate(s_out), np.concatenate(i_out)

    def _run_many(self, requests):
        """requests: [(queries, k)] — coalesced into shared device batches."""
        merged = [q for queries, _ in requests for q in queries]
        scores, indices = self._search_rows(merged)
        results, row = [], 0
        for queries, k in requests:
            n = len(queries)
            results.append([
                [
                    {"id": self.doc_ids[int(d)], "score": float(s)}
                    for d, s in zip(indices[row + r, :k], scores[row + r, :k])
                    if np.isfinite(s)
                ]
                for r in range(n)
            ])
            row += n
        return results

    def search(self, queries, k: int = 10):
        if not queries:
            return []
        return self._submit(queries, k)


class RerankService(_QueueService):
    """Compiled cross-encoder pair scoring behind a single-consumer queue.

    Semantics match the batch rerank runtime (retriever/reranker.py:
    RRModel.score -> relevance_logprob, i.e. 2-column outputs log-softmaxed
    to log P(relevant), 1-column raw)."""

    def __init__(self, model, params, tokenizer, q_max_len: int,
                 p_max_len: int, max_batch: int):
        import jax
        import jax.numpy as jnp

        from ..retriever.reranker import _model_max_positions, device_pair_len

        self.tokenizer = tokenizer
        self.max_len = q_max_len + p_max_len + 2
        # pad pairs to a 128-lane multiple on device (measured +10%
        # cross-encoder throughput vs the raw pair length, +25% vs
        # rounding to 64; reranker.py device_pair_len), capped at the
        # encoder's position capacity
        self.device_len = device_pair_len(self.max_len,
                                          _model_max_positions(model))
        self.max_batch = max_batch

        @jax.jit
        def score(p, ids, mask, segs):
            s = model.score(p, ids, mask, segs)
            return model.relevance_logprob(s)

        self._score = score
        self._params = params
        self._jnp = jnp
        self._start_worker()

    def warmup(self):
        """Compile EVERY reachable pad_len bucket, not just S=128: the
        first live request landing in a cold bucket would otherwise block
        the single worker thread for a multi-minute remote compile while
        the bounded queue fills with 503s. Batches are always padded to
        max_batch, so each bucket is exactly one (max_batch, pad_len)
        shape — compile it directly."""
        jnp = self._jnp
        if self.device_len % 128 == 0:
            buckets = range(128, self.device_len + 1, 128)
        else:
            buckets = (self.device_len,)
        for pad_len in buckets:
            ids = jnp.zeros((self.max_batch, pad_len), jnp.int32)
            np.asarray(self._score(self._params, ids, jnp.ones_like(ids),
                                   jnp.zeros_like(ids)))
        # and one real end-to-end request through the tokenizer path
        self.rerank("warmup", [{"id": "w", "text": "warmup"}])

    @staticmethod
    def _rows(args):
        return len(args[1])

    def _score_pairs(self, flat_pairs):
        """flat_pairs: [(query, doc_text)] merged across requests; one
        device dispatch per max_batch chunk. Returns scores [n]."""
        from ..data.collators import pad_ids
        from ..retriever.reranker import encode_pair

        jnp = self._jnp
        pad_id = self.tokenizer.pad_token_id or 0
        scores = np.empty(len(flat_pairs), np.float32)
        for start in range(0, len(flat_pairs), self.max_batch):
            chunk = flat_pairs[start : start + self.max_batch]
            pairs = [encode_pair(self.tokenizer, q, t, self.max_len)
                     for q, t in chunk]
            pairs = pairs + [pairs[-1]] * (self.max_batch - len(chunk))
            # smallest 128-aligned length that fits the chunk (one compiled
            # graph per bucket; short chunks score ~2x faster at S=128)
            longest = max(len(p[0]) for p in pairs)
            pad_len = min(self.device_len,
                          max(-(-longest // 128) * 128, 128)) \
                if self.device_len % 128 == 0 else self.device_len
            batch = pad_ids([p[0] for p in pairs], pad_len, pad_id)
            segs = np.zeros_like(batch["input_ids"])
            for i, (_, s) in enumerate(pairs):
                s = s[: self.max_len]
                segs[i, : len(s)] = s
            t_dev = time.monotonic()  # device span: upload->score->readback
            out = self._score(
                self._params, jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]), jnp.asarray(segs),
            )
            scores[start : start + len(chunk)] = np.asarray(out, np.float32)[: len(chunk)]
            self._exec_device_s = getattr(self, "_exec_device_s", 0.0) \
                + (time.monotonic() - t_dev)
        return scores

    def _run_many(self, requests):
        """requests: [(query, docs)] — pair lists flattened into shared
        device batches, per-request ranking at the split."""
        flat = [(q, d["text"]) for q, docs in requests for d in docs]
        scores = self._score_pairs(flat)
        results, row = [], 0
        for _, docs in requests:
            s = scores[row : row + len(docs)]
            order = np.argsort(-s, kind="stable")
            results.append([
                {"id": docs[int(i)]["id"], "score": float(s[int(i)])}
                for i in order
            ])
            row += len(docs)
        return results

    def rerank(self, query: str, docs):
        if not docs:
            return []
        return self._submit(query, docs)


def make_handler(service, default_k: int, rerank_service=None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                payload = {"status": "ok",
                           "endpoints": (["/search"] if service else [])
                                        + (["/rerank"] if rerank_service else [])}
                if service:
                    payload["num_docs"] = service.searcher.n_docs
                self._send(200, payload)
            else:
                self._send(404, {"error": "unknown path"})

        def _handle_search(self, req):
            if service is None:
                self._send(404, {"error": "/search not enabled (no --encoded_save_path)"})
                return
            queries = req.get("queries")
            if not isinstance(queries, list) or not all(isinstance(q, str) for q in queries):
                self._send(400, {"error": "'queries' must be a list of strings"})
                return
            try:
                k = int(req.get("k", default_k))
            except (TypeError, ValueError):
                self._send(400, {"error": "'k' must be an integer"})
                return
            max_k = service.searcher.k
            if k < 1 or k > max_k:
                self._send(400, {"error": f"'k' must be in [1, {max_k}] "
                                          "(the index was built with "
                                          f"retrieve_depth={max_k})"})
                return
            self._send(200, {"results": service.search(queries, k=k)})

        def _handle_rerank(self, req):
            if rerank_service is None:
                self._send(404, {"error": "/rerank not enabled (no --rr_model_name_or_path)"})
                return
            query = req.get("query")
            docs = req.get("docs")
            if not isinstance(query, str):
                self._send(400, {"error": "'query' must be a string"})
                return
            if (not isinstance(docs, list) or not docs
                    or not all(isinstance(d, dict) and "id" in d and
                               isinstance(d.get("text"), str) for d in docs)):
                self._send(400, {"error": "'docs' must be a non-empty list of "
                                          "{'id': ..., 'text': str} objects"})
                return
            self._send(200, {"results": rerank_service.rerank(query, docs)})

        def do_POST(self):
            routes = {"/search": self._handle_search, "/rerank": self._handle_rerank}
            handler = routes.get(self.path)
            if handler is None:
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                handler(req)
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid JSON body"})
            except OverloadedError as e:
                self._send(503, {"error": str(e)})
            except Exception as e:
                self._send(500, {"error": str(e)})

    return Handler


def build_service(model_args, data_args, infer_args, max_batch: int) -> RetrievalService:
    import jax

    from ..retriever.retriever import Retriever

    tokenizer = load_tokenizer(model_args)
    model, params = DRModel.build(model_args)
    retriever = Retriever.from_embeddings(
        model, params, data_args, infer_args, tokenizer.pad_token_id or 0
    )
    # multi-chip hosts serve through the mesh Searcher (the fused kernel
    # pipeline per chip — "queries" replicates the index and splits the
    # batch, zero collectives; "docs" row-shards for indexes beyond one
    # chip's HBM). --search_partition / --search_method select the shape.
    mesh = None
    if jax.device_count() > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(dp_size=jax.device_count(), tp_size=1)
    # bf16-cast on the HOST: the Searcher's mesh branches place the index
    # themselves (sharded or replicated device_put); a jnp.asarray here
    # would first stage the full corpus on one device — at 8.8M docs a
    # 12.65 GiB allocation held ALONGSIDE the mesh placement (over-ceiling
    # allocations hang the tunnel and leak server-side)
    import ml_dtypes
    import numpy as np

    host_emb = np.asarray(retriever.doc_embeddings).astype(ml_dtypes.bfloat16)
    searcher = Searcher(
        host_emb,
        k=infer_args.retrieve_depth,
        mesh=mesh,
        method=getattr(infer_args, "search_method", "auto"),
        partition=getattr(infer_args, "search_partition", "docs"),
        n_segs=getattr(infer_args, "search_n_segs", 1),
    )
    return RetrievalService(
        model, params, tokenizer, searcher, retriever.doc_ids,
        q_max_len=data_args.q_max_len, max_batch=max_batch,
    )


def build_rerank_service(rr_path: str, data_args, max_batch: int) -> "RerankService":
    from ..models.rr_model import RRModel

    rr_model_args = ModelArguments(model_name_or_path=rr_path)
    tokenizer = load_tokenizer(rr_model_args)
    model, params = RRModel.build(rr_model_args, tokenizer=tokenizer)
    return RerankService(
        model, params, tokenizer,
        q_max_len=data_args.q_max_len, p_max_len=data_args.p_max_len,
        max_batch=max_batch,
    )


class ServingHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with a production listen backlog.

    socketserver's default ``request_queue_size`` is 5. Concurrent
    clients that open one TCP connection per request overflow that SYN
    backlog, and each dropped SYN retransmits after the kernel's 1 s
    initial RTO — measured on the chip as a load-independent ~1.1 s
    p95/p99 plateau while the dispatch worker's own timeline showed zero
    stalls >133 ms (docs/performance.md, serving section). A deep
    backlog removes the cliff; the coalescing queue's bounded
    backpressure (``_QueueService.max_queue``) still protects the
    worker.
    """

    request_queue_size = 1024


def main(argv=None):
    import argparse

    setup_logging()
    parser = ArgumentParser((ModelArguments, DataArguments, InferenceArguments))
    extra = argparse.ArgumentParser()
    extra.add_argument("--port", type=int, default=8080)
    extra.add_argument("--max_batch", type=int, default=64)
    extra.add_argument("--rr_model_name_or_path", default=None,
                       help="cross-encoder checkpoint enabling POST /rerank")
    argv_list = list(argv) if argv is not None else None
    if argv_list is None:
        import sys

        argv_list = sys.argv[1:]
    extra_args, rest = extra.parse_known_args(argv_list)
    model_args, data_args, infer_args = parser.parse(rest)

    service = None
    if infer_args.encoded_save_path:
        service = build_service(model_args, data_args, infer_args, extra_args.max_batch)
        service.warmup()
    rerank_service = None
    if extra_args.rr_model_name_or_path:
        rerank_service = build_rerank_service(
            extra_args.rr_model_name_or_path, data_args, extra_args.max_batch
        )
        rerank_service.warmup()
    if service is None and rerank_service is None:
        raise ValueError(
            "nothing to serve: pass --encoded_save_path (retrieval) and/or "
            "--rr_model_name_or_path (rerank)"
        )
    server = ServingHTTPServer(
        ("0.0.0.0", extra_args.port),
        make_handler(service, infer_args.retrieve_depth, rerank_service),
    )
    endpoints = (["/search"] if service else []) + (["/rerank"] if rerank_service else [])
    print(f"serving {'+'.join(endpoints)} on :{extra_args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
