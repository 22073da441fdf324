"""Retrieval serving: hold the model + index resident, answer queries.

The reference has no serving story (batch TREC runs only); this driver
closes the gap for the production path the framework targets: a DR
checkpoint + corpus embedding shards live in HBM behind a compiled
``Searcher``, queries arrive over HTTP, and responses are JSON.

    python -m openmatch_tpu.drivers.serve \
        --model_name_or_path ckpt_dr --encoded_save_path embeddings/ \
        --port 8080 [--retrieve_depth 100] [--max_batch 64]

    GET  /health
    POST /search   {"queries": ["...", ...], "k": 10}
      -> {"results": [[{"id": ..., "score": ...}, ...], ...]}

Design notes: one worker thread owns the TPU (JAX programs are not
thread-safe to call concurrently); HTTP handlers enqueue and wait. Queries
are padded into the fixed compiled batch shape so XLA never recompiles
after warmup.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..config import ArgumentParser, DataArguments, InferenceArguments, ModelArguments
from ..models.dr_model import DRModel
from ..ops.mips import Searcher
from .common import load_tokenizer, setup_logging


class RetrievalService:
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
        self._queue: "queue.Queue" = queue.Queue()

        @jax.jit
        def encode(p, ids, mask):
            return model.encode_query(p, ids, mask)

        self._encode = encode
        self._params = params
        self._jnp = jnp
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def warmup(self):
        self.search(["warmup"], k=1)

    def _run(self, queries, k):
        from ..data.collators import pad_ids

        jnp = self._jnp
        n = len(queries)
        enc = [
            self.tokenizer.encode_plus(
                q, truncation="only_first", max_length=self.q_max_len,
                padding=False, return_attention_mask=False,
                return_token_type_ids=False,
            )["input_ids"]
            for q in queries
        ]
        enc = enc + [enc[-1]] * (self.max_batch - n)  # fixed compiled shape
        batch = pad_ids(enc, self.q_max_len, self.tokenizer.pad_token_id or 0)
        reps = self._encode(
            self._params, jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"])
        )
        scores, indices = self.searcher.search(reps.astype(self.searcher.corpus.dtype))
        scores = np.asarray(scores, np.float32)[:n, :k]
        indices = np.asarray(indices)[:n, :k]
        return [
            [
                {"id": self.doc_ids[int(d)], "score": float(s)}
                for d, s in zip(indices[r], scores[r])
                if np.isfinite(s)
            ]
            for r in range(n)
        ]

    def _worker(self):
        while True:
            queries, k, reply = self._queue.get()
            try:
                reply.put(("ok", self._run(queries, k)))
            except Exception as e:  # surface errors to the caller
                reply.put(("error", str(e)))

    def search(self, queries, k: int = 10):
        if not queries:
            return []
        if len(queries) > self.max_batch:
            out = []
            for i in range(0, len(queries), self.max_batch):
                out.extend(self.search(queries[i : i + self.max_batch], k))
            return out
        reply: "queue.Queue" = queue.Queue()
        self._queue.put((queries, k, reply))
        status, payload = reply.get()
        if status == "error":
            raise RuntimeError(payload)
        return payload


def make_handler(service: RetrievalService, default_k: int):
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
                self._send(200, {"status": "ok", "num_docs": service.searcher.n_docs})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/search":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                queries = req.get("queries")
                if not isinstance(queries, list) or not all(isinstance(q, str) for q in queries):
                    self._send(400, {"error": "'queries' must be a list of strings"})
                    return
                k = int(req.get("k", default_k))
                max_k = service.searcher.k
                if k < 1 or k > max_k:
                    self._send(400, {"error": f"'k' must be in [1, {max_k}] "
                                              "(the index was built with "
                                              f"retrieve_depth={max_k})"})
                    return
                results = service.search(queries, k=k)
                self._send(200, {"results": results})
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid JSON body"})
            except Exception as e:
                self._send(500, {"error": str(e)})

    return Handler


def build_service(model_args, data_args, infer_args, max_batch: int) -> RetrievalService:
    import jax.numpy as jnp

    from ..retriever.retriever import Retriever

    tokenizer = load_tokenizer(model_args)
    model, params = DRModel.build(model_args)
    retriever = Retriever.from_embeddings(
        model, params, data_args, infer_args, tokenizer.pad_token_id or 0
    )
    searcher = Searcher(
        jnp.asarray(retriever.doc_embeddings, jnp.bfloat16),
        k=infer_args.retrieve_depth,
    )
    return RetrievalService(
        model, params, tokenizer, searcher, retriever.doc_ids,
        q_max_len=data_args.q_max_len, max_batch=max_batch,
    )


def main(argv=None):
    import argparse

    setup_logging()
    parser = ArgumentParser((ModelArguments, DataArguments, InferenceArguments))
    extra = argparse.ArgumentParser()
    extra.add_argument("--port", type=int, default=8080)
    extra.add_argument("--max_batch", type=int, default=64)
    argv_list = list(argv) if argv is not None else None
    if argv_list is None:
        import sys

        argv_list = sys.argv[1:]
    extra_args, rest = extra.parse_known_args(argv_list)
    model_args, data_args, infer_args = parser.parse(rest)

    service = build_service(model_args, data_args, infer_args, extra_args.max_batch)
    service.warmup()
    server = ThreadingHTTPServer(("0.0.0.0", extra_args.port), make_handler(service, infer_args.retrieve_depth))
    print(f"serving {service.searcher.n_docs} docs on :{extra_args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
