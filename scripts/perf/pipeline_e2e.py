"""End-to-end CLI chain on hardware: build_index → retrieve → evaluate.

VERDICT r3 next #8: the perf suite times kernels, not drivers — this
proves the L7 driver path itself is TPU-clean and reports wall time per
stage. A synthetic corpus is generated where query text i IS doc text i,
so with a shared normalized encoder the relevant doc scores cos=1 and
the expected MRR@10 is ~1.0 — a functional check riding the perf run.

    python scripts/perf/pipeline_e2e.py [--n-docs 100000] [--n-queries 512]
        [--depth 100] [--cpu] [--tiny] [--workdir DIR]

Each driver stage runs as its own subprocess (`python -m
openmatch_tpu.drivers.*`), exactly as a user would invoke it; the TPU
client is therefore one process at a time (CLAUDE.md tunnel rule).

--tiny swaps in a 1-layer/16-dim model for fast plumbing smokes; its
near-constant random reps tie at bf16 precision, so expect
functional_pass=false there — the MRR check is meaningful only at the
default BERT-base shape (CPU-verified: 512 docs → MRR 1.0).
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_data(workdir, n_docs, n_queries, seed=0):
    rng = np.random.RandomState(seed)
    corpus = os.path.join(workdir, "corpus.jsonl")
    with open(corpus, "w") as f:
        for i in range(n_docs):
            words = " ".join(f"term{w}" for w in rng.randint(0, 180, size=24))
            f.write(json.dumps({"id": f"d{i}", "text": words}) + "\n")
    # queries repeat the first n_queries docs' text verbatim -> the
    # matching doc is the exact-cosine-1 nearest neighbor
    qids = rng.choice(n_docs, size=n_queries, replace=False)
    queries = os.path.join(workdir, "queries.tsv")
    qrels = os.path.join(workdir, "qrels.txt")
    with open(corpus) as f:
        docs = [json.loads(l) for l in f]
    with open(queries, "w") as fq, open(qrels, "w") as fr:
        for qi, di in enumerate(qids):
            fq.write(f"q{qi}\t{docs[di]['text']}\n")
            fr.write(f"q{qi} 0 d{di} 1\n")
    return corpus, queries, qrels


def make_checkpoint(workdir, tiny):
    """Random-weight HF checkpoint (no network egress: tests' pattern)."""
    from transformers import BertConfig, BertModel, BertTokenizerFast

    ckpt = os.path.join(workdir, "ckpt")
    if tiny:
        cfg = BertConfig(vocab_size=256, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32)
    else:
        cfg = BertConfig(vocab_size=256)  # bert-base shape, tiny vocab
    BertModel(cfg).save_pretrained(ckpt)
    vocab = os.path.join(workdir, "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                          + [f"term{i}" for i in range(200)]))
    BertTokenizerFast(vocab_file=vocab).save_pretrained(ckpt)
    return ckpt


def run_stage(name, cmd, env, timings):
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    dt = time.time() - t0
    timings[name] = round(dt, 1)
    tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-3:])
    print(f"[{name}] {dt:.1f}s rc={proc.returncode}\n{tail}", flush=True)
    if proc.returncode != 0:
        raise SystemExit(f"stage {name} failed")
    return proc.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--n-queries", type=int, default=512)
    ap.add_argument("--depth", type=int, default=100)
    ap.add_argument("--cpu", action="store_true", help="smoke-test mode")
    ap.add_argument("--tiny", action="store_true", help="tiny model (smoke)")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="pipeline_e2e_")
    os.makedirs(workdir, exist_ok=True)
    print(f"workdir {workdir}", flush=True)

    corpus, queries, qrels = gen_data(workdir, args.n_docs, args.n_queries)
    ckpt = make_checkpoint(workdir, args.tiny)
    emb = os.path.join(workdir, "emb")
    run = os.path.join(workdir, "run.trec")

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    if args.cpu:
        env["OPENMATCH_FORCE_CPU"] = "1"  # read by drivers/common.py if set
        # the axon plugin ignores JAX_PLATFORMS; drivers honor this knob
    py = [sys.executable, "-m"]

    timings = {}
    run_stage("build_index", py + [
        "openmatch_tpu.drivers.build_index",
        "--model_name_or_path", ckpt, "--corpus_path", corpus,
        "--encoded_save_path", emb, "--p_max_len", "32",
        "--per_device_eval_batch_size", "512",
        # identity functional check: doc text must tokenize exactly like
        # the query text (the default doc template prepends "Title: ...")
        "--doc_template", "<text>",
    ], env, timings)
    run_stage("retrieve", py + [
        "openmatch_tpu.drivers.retrieve",
        "--model_name_or_path", ckpt, "--query_path", queries,
        "--encoded_save_path", emb, "--trec_save_path", run,
        "--q_max_len", "32", "--retrieve_depth", str(args.depth),
        "--per_device_eval_batch_size", "128",
    ], env, timings)
    out = run_stage("evaluate", py + [
        "openmatch_tpu.drivers.evaluate", "-m", "mrr_cut.10", qrels, run,
    ], env, timings)
    mrr = float(out.strip().splitlines()[-1].split()[-1])

    total = sum(timings.values())
    print(json.dumps({
        "n_docs": args.n_docs, "n_queries": args.n_queries,
        "stage_s": timings, "total_s": round(total, 1),
        "mrr_cut_10": mrr,
        "functional_pass": mrr > 0.99,
    }), flush=True)


if __name__ == "__main__":
    main()
