"""ContrastQG synthesis pipeline — the reference's five target-domain NLG
inference steps as ONE driver (v1/docs/contrastive-supervision-synthesis.md:26-110,
which chains prepro_dataset.sh, qg_inference.sh, bm25 build_index.sh +
retrieve.sh, sample_contrast_pairs.sh, cqg_inference.sh by hand):

    1. prepro        — target-domain corpus jsonl/tsv -> {doc_id: text}
    2. seed QG       — trained QG model generates a seed query per doc
    3. BM25 subset   — our native BM25 engine retrieves per seed query
                       (Anserini replacement, bm25/engine.py)
    4. pair sampling — contrast (doc+, doc-) pairs from the run's rank
                       bands (research/qg.build_contrast_pairs)
    5. ContrastQG    — trained ContrastQG model generates contrastive
                       queries; output is OpenMatch train jsonl directly
                       consumable by drivers/train_dr.

    python -m openmatch_tpu.drivers.qg_synthesis \
        --corpus_path docs.jsonl --output_path synthetic.train.jsonl \
        --qg_model_path <seed QG ckpt> --cqg_model_path <ContrastQG ckpt> \
        --tokenizer_name <tokenizer> [--bm25_topk 100] [--max_docs N] \
        [--neg_rank_lo 50 --neg_rank_hi 100] [--temperature 0.0]
"""

from __future__ import annotations

import argparse
import logging
from typing import Dict, Optional, Tuple

logger = logging.getLogger(__name__)


def run_pipeline(
    qg,
    cqg,
    tokenizer,
    corpus: Dict[str, str],
    output_path: str,
    max_src_len: int = 256,
    max_new_tokens: int = 24,
    batch_size: int = 16,
    bm25_topk: int = 100,
    neg_rank_range: Tuple[int, int] = (50, 100),
    temperature: float = 0.0,
    k1: float = 0.9,
    b: float = 0.4,
    max_docs: Optional[int] = None,
    seed: int = 0,
    eos_token_id: int = 1,
) -> int:
    """Steps 2-5 over an in-memory corpus; returns examples written.

    Library entry so recipes/tests can drive it without the CLI; ``qg``
    and ``cqg`` are research.qg.QGModel instances (seed QG consumes the
    raw doc text; ContrastQG consumes the 'positive: ... negative: ...'
    concatenation, research/qg.make_contrast_input)."""
    from ..bm25.engine import BM25Retriever
    from ..research.qg import (build_contrast_pairs, generate_seed_queries,
                               synthesize_training_data)

    doc_ids = list(corpus.keys())[: max_docs or None]
    seed_queries = generate_seed_queries(
        qg, tokenizer, corpus, doc_ids, max_src_len=max_src_len,
        max_new_tokens=max_new_tokens, batch_size=batch_size,
        temperature=temperature, eos_token_id=eos_token_id)
    logger.info("seed QG: %d queries for %d docs", len(seed_queries), len(doc_ids))

    retriever = BM25Retriever(k1=k1, b=b)
    retriever.index_corpus(
        {"id": d, "text": t} for d, t in corpus.items())
    run = retriever.retrieve(seed_queries, k=bm25_topk)
    logger.info("BM25 subset retrieval: %d result lists", len(run))

    # seed query qid == its source doc id, so the positive is the source
    # doc itself (reference sample_contrast_pairs semantics)
    pairs = build_contrast_pairs(
        run, seed_doc_of_query={d: d for d in seed_queries},
        neg_rank_range=neg_rank_range, seed=seed)

    n = synthesize_training_data(
        cqg, tokenizer, corpus, pairs, output_path,
        max_src_len=max_src_len, max_new_tokens=max_new_tokens,
        batch_size=batch_size, temperature=temperature,
        eos_token_id=eos_token_id)
    logger.info("ContrastQG: wrote %d training examples to %s", n, output_path)
    return n


def load_corpus(path: str) -> Dict[str, str]:
    """Step 1: normalize a jsonl/tsv target-domain corpus to id -> text
    (title prepended when present — reference prepro_dataset semantics)."""
    from .bm25_retrieve import iter_corpus

    corpus = {}
    for d in iter_corpus(path):
        text = d.get("text", "")
        title = d.get("title", "")
        corpus[str(d["id"])] = f"{title} {text}".strip() if title else text
    return corpus


def main(argv=None):
    from .common import setup_logging

    setup_logging()
    from transformers import AutoTokenizer

    from ..research.qg import QGModel

    parser = argparse.ArgumentParser()
    parser.add_argument("--corpus_path", required=True)
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--qg_model_path", required=True)
    parser.add_argument("--cqg_model_path", required=True)
    parser.add_argument("--tokenizer_name", required=True)
    parser.add_argument("--max_src_len", type=int, default=256)
    parser.add_argument("--max_new_tokens", type=int, default=24)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--bm25_topk", type=int, default=100)
    parser.add_argument("--neg_rank_lo", type=int, default=50)
    parser.add_argument("--neg_rank_hi", type=int, default=100)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--k1", type=float, default=0.9)
    parser.add_argument("--b", type=float, default=0.4)
    parser.add_argument("--max_docs", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_name)
    qg = QGModel.from_pretrained(args.qg_model_path)
    cqg = QGModel.from_pretrained(args.cqg_model_path)
    corpus = load_corpus(args.corpus_path)
    run_pipeline(
        qg, cqg, tokenizer, corpus, args.output_path,
        max_src_len=args.max_src_len, max_new_tokens=args.max_new_tokens,
        batch_size=args.batch_size, bm25_topk=args.bm25_topk,
        neg_rank_range=(args.neg_rank_lo, args.neg_rank_hi),
        temperature=args.temperature, k1=args.k1, b=args.b,
        max_docs=args.max_docs, seed=args.seed)


if __name__ == "__main__":
    main()
