"""Serve-under-load measurement: /search and /rerank on the real chip.

VERDICT r3 weak #5: the serving layer's coalescing + backpressure are
CPU-tested but the flagship endpoints had no measured latency/throughput
on hardware, and the 2 ms coalesce window was an untested guess against
the ~27 ms tunnel dispatch. This drives the LIVE HTTP surface
(drivers/serve.py services behind ThreadingHTTPServer) with concurrent
closed-loop clients and reports p50/p95/p99 latency, QPS, and the
coalescing stats.

    python scripts/perf/serve_load.py --mode search [--n-docs 1000000]
        [--concurrency 32] [--duration 30] [--coalesce-ms 2]
        [--max-batch 64] [--cpu]

One config per process (CLAUDE.md: one tunnel client, one compile).
The model is a random-weight BERT-base (serving cost is shape-, not
value-dependent); the corpus is random normalized embeddings.
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np

sys.path.insert(0, "/root/repo")


def build_tokenizer(tmpdir):
    from transformers import BertTokenizerFast

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"term{i}" for i in range(200)]
    path = os.path.join(tmpdir, "vocab.txt")
    with open(path, "w") as f:
        f.write("\n".join(words))
    return BertTokenizerFast(vocab_file=path)


def percentiles(lat_ms):
    lat = np.sort(np.asarray(lat_ms))
    pick = lambda p: float(lat[min(len(lat) - 1, int(p * len(lat)))])
    return pick(0.50), pick(0.95), pick(0.99)


def run_clients(port, endpoint, payloads, concurrency, duration_s):
    """Closed-loop clients: each thread sends one request, waits, repeats.
    Returns (latencies_ms, errors, wall_s)."""
    lats, errors = [], [0]
    lock = threading.Lock()
    stop = time.monotonic() + duration_s

    def client(i):
        k = 0
        while time.monotonic() < stop:
            body = json.dumps(payloads[(i + k) % len(payloads)]).encode()
            k += 1
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{endpoint}", data=body,
                headers={"Content-Type": "application/json"})
            t0 = time.monotonic()
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    r.read()
                dt = (time.monotonic() - t0) * 1e3
                with lock:
                    lats.append(dt)
            except Exception:
                with lock:
                    errors[0] += 1

    t0 = time.monotonic()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return lats, errors[0], time.monotonic() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["search", "rerank"], default="search")
    ap.add_argument("--n-docs", type=int, default=1_000_000)
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--coalesce-ms", type=float, default=2.0)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--depth", type=int, default=100, help="searcher k")
    ap.add_argument("--docs-per-req", type=int, default=16, help="rerank")
    ap.add_argument("--port", type=int, default=18321)
    ap.add_argument("--cpu", action="store_true", help="smoke-test mode")
    ap.add_argument("--shallow-backlog", action="store_true",
                    help="use the stock 5-deep listen backlog (the r4 "
                         "config that produced the 1.1 s SYN-retransmit "
                         "tail) for A/B comparison")
    args = ap.parse_args()

    import tempfile

    from openmatch_tpu.drivers.common import enable_compilation_cache

    if not args.cpu:
        enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from openmatch_tpu.drivers.serve import (
        RerankService, RetrievalService, ServingHTTPServer, _QueueService,
        make_handler)
    from openmatch_tpu.models.bert import BertConfig

    _QueueService.coalesce_window_s = args.coalesce_ms / 1e3

    tmpdir = tempfile.mkdtemp()
    tokenizer = build_tokenizer(tmpdir)
    cfg = BertConfig(vocab_size=256, add_pooler=False) if not args.cpu else BertConfig(
        vocab_size=256, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32, add_pooler=False)
    rng = np.random.RandomState(0)

    search_service = rerank_service = None
    if args.mode == "search":
        from openmatch_tpu.models.dr_model import DRModel
        from openmatch_tpu.ops.mips import Searcher

        model = DRModel(encoder_config=cfg, normalize=True, dtype=jnp.bfloat16)
        params = model.init_params(jax.random.PRNGKey(0))
        D = cfg.hidden_size
        reps = rng.randn(args.n_docs, D).astype(np.float32)
        reps /= np.linalg.norm(reps, axis=1, keepdims=True)
        searcher = Searcher(jnp.asarray(reps, jnp.bfloat16), k=args.depth)
        doc_ids = [f"d{i}" for i in range(args.n_docs)]
        search_service = RetrievalService(
            model, params, tokenizer, searcher, doc_ids,
            q_max_len=32, max_batch=args.max_batch)
        service = search_service
        t0 = time.time()
        service.warmup()
        print(f"warmup (compile): {time.time() - t0:.1f}s", flush=True)
        payloads = [{"queries": [f"term{i % 200} term{(7 * i) % 200}"], "k": 10}
                    for i in range(512)]
        endpoint = "/search"
    else:
        from openmatch_tpu.models.rr_model import RRModel

        model = RRModel(encoder_config=cfg, head_in_dim=cfg.hidden_size,
                        dtype=jnp.bfloat16)
        params = model.init_params(jax.random.PRNGKey(0))
        rerank_service = RerankService(model, params, tokenizer,
                                       q_max_len=32, p_max_len=128,
                                       max_batch=args.max_batch)
        service = rerank_service
        t0 = time.time()
        service.warmup()
        print(f"warmup (compile): {time.time() - t0:.1f}s", flush=True)
        payloads = [{
            "query": f"term{i % 200}",
            "docs": [{"id": f"d{j}", "text": f"term{(i + j) % 200} " * 20}
                     for j in range(args.docs_per_req)],
        } for i in range(64)]
        endpoint = "/rerank"

    handler = make_handler(search_service, default_k=10,
                           rerank_service=rerank_service)
    server_cls = ThreadingHTTPServer if args.shallow_backlog else ServingHTTPServer
    httpd = server_cls(("127.0.0.1", args.port), handler)
    server_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    server_thread.start()

    # short warm pass so compiles/caches are settled before measurement
    run_clients(args.port, endpoint, payloads, min(4, args.concurrency), 2.0)
    for k in service.stats:
        service.stats[k] = 0
    service.timeline = []  # per-dispatch wait/exec/device record

    lats, errors, wall = run_clients(args.port, endpoint, payloads,
                                     args.concurrency, args.duration)
    httpd.shutdown()
    if not lats:
        raise SystemExit(f"no successful requests ({errors} errors)")
    p50, p95, p99 = percentiles(lats)
    qps = len(lats) / wall
    st = service.stats
    coalesced = st["requests"] / max(st["dispatch_groups"], 1)
    print(json.dumps({
        "mode": args.mode, "n_docs": args.n_docs,
        "concurrency": args.concurrency, "coalesce_ms": args.coalesce_ms,
        "max_batch": args.max_batch, "requests": len(lats),
        "errors": errors, "qps": round(qps, 1),
        "p50_ms": round(p50, 1), "p95_ms": round(p95, 1),
        "p99_ms": round(p99, 1),
        "avg_coalesced_per_dispatch": round(coalesced, 2),
        "max_coalesced": st["max_coalesced"],
    }), flush=True)

    # ---- tail root-cause: which dispatches stalled, and where ----------
    tl = service.timeline or []
    if tl:
        t_base = tl[0]["t"]
        execs = np.array([d["exec_s"] for d in tl])
        devs = np.array([d["device_s"] for d in tl])
        waits = np.array([d["wait_s"] for d in tl])
        print(f"dispatches={len(tl)}  exec p50/p95/max = "
              f"{np.percentile(execs, 50) * 1e3:.0f}/"
              f"{np.percentile(execs, 95) * 1e3:.0f}/"
              f"{execs.max() * 1e3:.0f} ms  "
              f"host(exec-device) p50 = "
              f"{np.percentile(execs - devs, 50) * 1e3:.0f} ms  "
              f"queue-wait p50/p95/max = "
              f"{np.percentile(waits, 50) * 1e3:.0f}/"
              f"{np.percentile(waits, 95) * 1e3:.0f}/"
              f"{waits.max() * 1e3:.0f} ms", flush=True)
        stalls = [d for d in tl if d["exec_s"] > 0.4]
        print(f"stalls (exec > 400 ms): {len(stalls)}", flush=True)
        prev = None
        for d in stalls[:20]:
            gap = "" if prev is None else f"  (+{d['t'] - prev:.1f}s)"
            print(f"  t={d['t'] - t_base:7.2f}s exec={d['exec_s'] * 1e3:6.0f} ms "
                  f"device={d['device_s'] * 1e3:6.0f} ms rows={d['rows']:3d}"
                  f"{gap}", flush=True)
            prev = d["t"]


if __name__ == "__main__":
    main()
