"""Serving layer: service batching/correctness + the live HTTP surface."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmatch_tpu.drivers.serve import RerankService, RetrievalService, make_handler
from openmatch_tpu.models.bert import BertConfig
from openmatch_tpu.models.dr_model import DRModel
from openmatch_tpu.ops.mips import Searcher


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("serve_tok")
    topics = [f"topic{i}" for i in range(8)]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "about", "document", "query"] + topics
    (d / "vocab.txt").write_text("\n".join(vocab))
    tokenizer = BertTokenizerFast(vocab_file=str(d / "vocab.txt"))

    cfg = BertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=16, add_pooler=False)
    model = DRModel(encoder_config=cfg, normalize=True, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))

    # corpus: encode 8 topic docs with the same (random) model so each
    # query's nearest doc is itself-ish (identity ranking is well-defined)
    from openmatch_tpu.data.collators import pad_ids

    docs = [f"document about topic{i}" for i in range(8)]
    enc = [tokenizer.encode_plus(t, truncation="only_first", max_length=8,
                                 return_attention_mask=False,
                                 return_token_type_ids=False)["input_ids"] for t in docs]
    batch = pad_ids(enc, 8, tokenizer.pad_token_id)
    reps = np.asarray(model.encode_passage(
        params, jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"])))
    searcher = Searcher(jnp.asarray(reps), k=4)
    return RetrievalService(model, params, tokenizer, searcher,
                            [f"d{i}" for i in range(8)], q_max_len=8, max_batch=4)


@pytest.fixture(scope="module")
def rerank_service(tmp_path_factory):
    from transformers import BertTokenizerFast

    from openmatch_tpu.models.rr_model import RRModel

    d = tmp_path_factory.mktemp("rr_tok")
    topics = [f"topic{i}" for i in range(4)]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "about", "document", "query"] + topics
    (d / "vocab.txt").write_text("\n".join(vocab))
    tokenizer = BertTokenizerFast(vocab_file=str(d / "vocab.txt"))

    cfg = BertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32, add_pooler=False)
    model = RRModel(encoder_config=cfg, head_in_dim=16)
    params = model.init_params(jax.random.PRNGKey(0))
    return RerankService(model, params, tokenizer, q_max_len=6, p_max_len=8, max_batch=2)


class TestService:
    def test_identity_retrieval(self, service):
        results = service.search(["document about topic3"], k=3)
        assert results[0][0]["id"] == "d3"
        assert results[0][0]["score"] >= results[0][1]["score"]

    def test_batch_larger_than_compiled_shape(self, service):
        queries = [f"document about topic{i}" for i in range(7)]  # > max_batch=4
        results = service.search(queries, k=1)
        assert [r[0]["id"] for r in results] == [f"d{i}" for i in range(7)]

    def test_empty(self, service):
        assert service.search([], k=5) == []


class TestMeshService:
    def test_mesh_searcher_service_identity(self, tmp_path, mesh8):
        """A RetrievalService over a mesh Searcher (the multi-chip serving
        shape build_service picks on >1-device hosts) returns the same
        identity ranking as the single-device service path."""
        from transformers import BertTokenizerFast

        from openmatch_tpu.data.collators import pad_ids

        topics = [f"topic{i}" for i in range(8)]
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "about",
                 "document", "query"] + topics
        (tmp_path / "vocab.txt").write_text("\n".join(vocab))
        tokenizer = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))
        cfg = BertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=16, add_pooler=False)
        model = DRModel(encoder_config=cfg, normalize=True, dtype=jnp.float32)
        params = model.init_params(jax.random.PRNGKey(0))
        docs = [f"document about topic{i}" for i in range(8)]
        enc = [tokenizer.encode_plus(t, truncation="only_first", max_length=8,
                                     return_attention_mask=False,
                                     return_token_type_ids=False)["input_ids"]
               for t in docs]
        batch = pad_ids(enc, 8, tokenizer.pad_token_id)
        reps = np.asarray(model.encode_passage(
            params, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"])))
        ids = [f"d{i}" for i in range(8)]

        single = RetrievalService(
            model, params, tokenizer,
            Searcher(jnp.asarray(reps), k=4, method="hier2"),
            ids, q_max_len=8, max_batch=4)
        meshed = RetrievalService(
            model, params, tokenizer,
            Searcher(reps.astype(np.float32), k=4, mesh=mesh8,
                     method="hier2", partition="queries"),
            ids, q_max_len=8, max_batch=4)
        queries = [f"document about topic{i}" for i in (1, 5)]
        r1 = single.search(queries, k=3)
        r2 = meshed.search(queries, k=3)
        assert [[d["id"] for d in row] for row in r1] == \
            [[d["id"] for d in row] for row in r2]


class TestCoalescing:
    """Cross-request coalescing + bounded-queue backpressure
    (VERDICT r2 next #10)."""

    def test_concurrent_requests_coalesce_into_one_dispatch(self, service):
        import threading

        service.search(["warm"], k=1)  # compile outside the window
        before = dict(service.stats)
        service.coalesce_window_s = 0.25  # generous gather window
        try:
            results = [None] * 4
            def call(i):
                results[i] = service.search([f"document about topic{i}"], k=2)
            threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
            # stagger-free start; the worker's window gathers the stragglers
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        finally:
            service.coalesce_window_s = type(service).coalesce_window_s
        assert all(r and r[0] for r in results)
        # per-request answers must match solo answers (split correctness)
        solo = service.search(["document about topic2"], k=2)
        assert results[2] == solo
        assert service.stats["max_coalesced"] >= 2
        # 4 requests arrived; strictly fewer dispatch groups than requests
        groups = service.stats["dispatch_groups"] - before["dispatch_groups"]
        reqs = service.stats["requests"] - before["requests"]
        assert reqs >= 4 and groups < reqs

    def test_mixed_k_split_correct(self, service):
        import threading

        service.coalesce_window_s = 0.25
        try:
            out = {}
            def call(k):
                out[k] = service.search(["document about topic1"], k=k)
            ts = [threading.Thread(target=call, args=(k,)) for k in (1, 3)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
        finally:
            service.coalesce_window_s = type(service).coalesce_window_s
        assert len(out[1][0]) <= 1 and len(out[3][0]) <= 3
        assert out[1][0][0] == out[3][0][0]  # same top hit

    def test_bounded_queue_overload(self, service):
        import threading
        import time as _time

        from openmatch_tpu.drivers.serve import OverloadedError

        blocker = threading.Event()
        orig = service._run_many
        service._run_many = lambda reqs: (blocker.wait(5), orig(reqs))[1]
        # shrink the live queue's bound (Queue.put reads maxsize at call
        # time; replacing the queue object would strand the worker)
        orig_max = service._queue.maxsize
        service._queue.maxsize = 2
        try:
            # one in-flight request occupies the worker...
            t = threading.Thread(target=lambda: service.search(["a"], k=1))
            t.start()
            _time.sleep(0.1)
            # ...two more fill the bounded queue; the next must 503
            t2 = threading.Thread(target=lambda: service.search(["b"], k=1))
            t3 = threading.Thread(target=lambda: service.search(["c"], k=1))
            t2.start(); t3.start()
            _time.sleep(0.1)
            with pytest.raises(OverloadedError):
                service.search(["d"], k=1)
        finally:
            blocker.set()
            t.join(); t2.join(); t3.join()
            service._run_many = orig
            service._queue.maxsize = orig_max


class TestRerankService:
    def test_scores_match_direct_model(self, rerank_service):
        """Service scores == unbatched RRModel.score->relevance_logprob on
        the same pairs (the batch runtime semantics, reranker.py:114-115),
        and results come back sorted descending."""
        import jax.numpy as jnp2

        from openmatch_tpu.retriever.reranker import encode_pair

        svc = rerank_service
        docs = [{"id": f"d{i}", "text": f"document about topic{i}"} for i in range(3)]
        results = svc.rerank("query about topic1", docs)
        assert sorted(r["id"] for r in results) == ["d0", "d1", "d2"]
        scores = [r["score"] for r in results]
        assert scores == sorted(scores, reverse=True)

        by_id = {r["id"]: r["score"] for r in results}
        for d in docs:
            ids, segs = encode_pair(svc.tokenizer, "query about topic1",
                                    d["text"], svc.max_len)
            pad = svc.max_len - len(ids)
            ids_a = jnp2.asarray([ids + [0] * pad])
            mask = jnp2.asarray([[1] * len(ids) + [0] * pad])
            segs_a = jnp2.asarray([list(segs) + [0] * pad])
            direct = float(np.asarray(svc._score(svc._params, ids_a, mask, segs_a))[0])
            assert by_id[d["id"]] == pytest.approx(direct, rel=1e-4)

    def test_chunking_beyond_max_batch(self, rerank_service):
        docs = [{"id": f"d{i}", "text": f"document about topic{i % 4}"} for i in range(5)]
        results = rerank_service.rerank("query", docs)  # max_batch=2 -> 3 chunks
        assert len(results) == 5

    def test_empty(self, rerank_service):
        assert rerank_service.rerank("q", []) == []


class TestHTTP:
    @pytest.fixture(scope="class")
    def server(self, service, rerank_service):
        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(service, 4, rerank_service))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_port}"
        httpd.shutdown()

    def _post(self, url, payload):
        req = urllib.request.Request(
            url + "/search", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def test_health(self, server):
        with urllib.request.urlopen(server + "/health") as resp:
            body = json.loads(resp.read())
        assert body["status"] == "ok"
        assert body["num_docs"] == 8

    def test_search(self, server):
        status, body = self._post(server, {"queries": ["document about topic5"], "k": 2})
        assert status == 200
        assert body["results"][0][0]["id"] == "d5"
        assert len(body["results"][0]) == 2

    def test_bad_payloads(self, server):
        status, body = self._post(server, {"queries": "not a list"})
        assert status == 400 and "list of strings" in body["error"]
        req = urllib.request.Request(
            server + "/search", data=b"{invalid", method="POST")
        try:
            urllib.request.urlopen(req)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 400

    def test_unknown_path(self, server):
        try:
            urllib.request.urlopen(server + "/nope")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404

    def test_rerank_endpoint(self, server):
        status, body = self._post_path(server, "/rerank", {
            "query": "query about topic1",
            "docs": [{"id": "a", "text": "document about topic0"},
                     {"id": "b", "text": "document about topic1"}],
        })
        assert status == 200
        assert sorted(r["id"] for r in body["results"]) == ["a", "b"]
        scores = [r["score"] for r in body["results"]]
        assert scores == sorted(scores, reverse=True)

    def test_rerank_bad_payloads(self, server):
        status, body = self._post_path(server, "/rerank", {"query": 1, "docs": []})
        assert status == 400 and "query" in body["error"]
        status, body = self._post_path(server, "/rerank",
                                       {"query": "q", "docs": [{"text": "no id"}]})
        assert status == 400 and "docs" in body["error"]

    def test_rerank_404_when_disabled(self, service):
        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(service, 4, rerank_service=None))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{httpd.server_port}"
        try:
            status, body = self._post_path(url, "/rerank",
                                           {"query": "q", "docs": [{"id": "a", "text": "t"}]})
            assert status == 404 and "not enabled" in body["error"]
            with urllib.request.urlopen(url + "/health") as resp:
                health = json.loads(resp.read())
            assert health["endpoints"] == ["/search"]
        finally:
            httpd.shutdown()

    def _post_path(self, url, path, payload):
        req = urllib.request.Request(
            url + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())


class TestRerankServiceBuckets:
    """Chunk-level length bucketing in RerankService._score_pairs: a
    short chunk dispatches at S=128, a long one at 256, and scores match
    direct scoring at the raw pair length either way."""

    @pytest.fixture(scope="class")
    def wide_service(self, tmp_path_factory):
        from transformers import BertTokenizerFast

        from openmatch_tpu.models.rr_model import RRModel

        d = tmp_path_factory.mktemp("rr_tok_wide")
        words = [f"w{i}" for i in range(8)]
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
        (d / "vocab.txt").write_text("\n".join(vocab))
        tokenizer = BertTokenizerFast(vocab_file=str(d / "vocab.txt"))

        cfg = BertConfig(vocab_size=16, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=512, add_pooler=False)
        model = RRModel(encoder_config=cfg, head_in_dim=16)
        params = model.init_params(jax.random.PRNGKey(0))
        svc = RerankService(model, params, tokenizer, q_max_len=62,
                            p_max_len=190, max_batch=4)
        yield svc, model, params

    def test_warmup_compiles_every_bucket(self, wide_service):
        """warmup() must dispatch one (max_batch, S) batch per reachable
        pad_len bucket — a cold bucket at serve time costs a multi-minute
        remote compile inside the single worker thread."""
        svc, _, _ = wide_service
        shapes = []
        orig = svc._score

        def recording(p, ids, mask, segs):
            shapes.append(tuple(ids.shape))
            return orig(p, ids, mask, segs)

        svc._score = recording
        try:
            svc.warmup()
        finally:
            svc._score = orig
        assert (svc.max_batch, 128) in shapes and (svc.max_batch, 256) in shapes

    def test_mixed_chunks_match_direct(self, wide_service):
        from openmatch_tpu.retriever.reranker import encode_pair

        svc, model, params = wide_service
        assert svc.device_len == 256
        docs = [{"id": "short", "text": "w0 w1"},
                {"id": "long", "text": " ".join(f"w{i % 8}" for i in range(180))}]
        results = svc.rerank("w0 w2", docs)
        by_id = {r["id"]: r["score"] for r in results}
        for d in docs:
            ids, segs = encode_pair(svc.tokenizer, "w0 w2", d["text"], svc.max_len)
            direct = float(np.asarray(svc._score(
                params, jnp.asarray([ids]),
                jnp.ones((1, len(ids)), jnp.int32),
                jnp.asarray([list(segs)])))[0])
            assert by_id[d["id"]] == pytest.approx(direct, rel=1e-4, abs=1e-5)
