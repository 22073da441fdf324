"""Contrastive supervision synthesis: T5 query generation + ContrastQG.

Reference: /root/reference/v1/Contrastive_Supervision_Synthesis/ (own code
~1k LoC over a vendored transformers copy; recipe at
v1/docs/contrastive-supervision-synthesis.md): (1) train a seed QG model
passage→query on MS MARCO; (2) train ContrastQG on (doc+, doc−)→query;
(3) pipeline: generate seed queries for target-domain docs, retrieve with
BM25 to pick contrast doc pairs, generate contrastive queries, emit
synthetic (query, doc+, doc−) training triples.

Built on models.t5.T5Seq2Seq (teacher forcing) + greedy/temperature decode.
ContrastQG input format: "positive: <doc+> negative: <doc−>" — one encoder
sequence, matching the reference's concatenation approach.
"""

from __future__ import annotations

import json
import logging
from functools import partial
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.t5 import T5Config, T5Seq2Seq, greedy_generate, seq2seq_loss, shift_right

logger = logging.getLogger(__name__)


class QGModel:
    """Thin trainer/generator wrapper around T5Seq2Seq."""

    def __init__(self, config: T5Config, params=None, dtype=jnp.float32):
        self.config = config
        self.model = T5Seq2Seq(config, dtype=dtype)
        self.params = params

    @classmethod
    def from_pretrained(cls, model_name_or_path: str, cache_dir=None, dtype=jnp.float32):
        from ..models.t5 import load_t5_encdec

        cfg, params = load_t5_encdec(model_name_or_path, cache_dir)
        return cls(cfg, jax.tree.map(jnp.asarray, params), dtype=dtype)

    def init_params(self, rng, seq_len: int = 8):
        ids = jnp.zeros((1, seq_len), jnp.int32)
        mask = jnp.ones((1, seq_len), jnp.int32)
        dec = jnp.zeros((1, 4), jnp.int32)
        self.params = self.model.init(rng, ids, mask, dec)["params"]
        return self.params

    # -- training -------------------------------------------------------

    def loss(self, params, batch) -> jnp.ndarray:
        """batch: input_ids/attention_mask (source doc) + labels [B, T]
        (target query ids, pad=0) + label_mask."""
        dec_in = shift_right(batch["labels"], self.config.decoder_start_token_id,
                             self.config.pad_token_id)
        out = self.model.apply(
            {"params": params}, batch["input_ids"], batch["attention_mask"], dec_in
        )
        return seq2seq_loss(out["logits"], batch["labels"], batch["label_mask"])

    def make_train_step(self):
        # the optimizer in effect is the TrainState's own tx (a tx
        # parameter here was dead and misleading)
        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            loss, grads = jax.value_and_grad(self.loss)(state.params, batch)
            return state.apply_gradients(grads), loss

        return step

    # -- generation -----------------------------------------------------

    def generate(self, input_ids, attention_mask, max_new_tokens: int = 32,
                 eos_token_id: int = 1, temperature: float = 0.0, rng=None):
        return greedy_generate(self.model, self.params, jnp.asarray(input_ids),
                               jnp.asarray(attention_mask), max_new_tokens,
                               eos_token_id, temperature, rng)


def _decode_generated(tokenizer, ids, eos_token_id: int = 1) -> str:
    ids = [int(t) for t in ids]
    if eos_token_id in ids:
        ids = ids[: ids.index(eos_token_id)]
    return tokenizer.decode(ids, skip_special_tokens=True).strip()


def generate_seed_queries(
    qg: QGModel,
    tokenizer,
    corpus: Dict[str, str],
    doc_ids: Optional[List[str]] = None,
    max_src_len: int = 256,
    max_new_tokens: int = 24,
    batch_size: int = 16,
    temperature: float = 0.0,
    eos_token_id: int = 1,
    rng=None,
) -> Dict[str, str]:
    """Step 2 of the reference pipeline (qg_inference.sh,
    contrastive-supervision-synthesis.md:45-60): one seed query per
    target-domain document from the trained QG model. Returns
    {doc_id: query_text} (empty generations dropped). ``temperature`` > 0
    needs ``rng`` (one PRNGKey, split per batch) — greedy_generate gates
    sampling on BOTH, so temperature alone silently decoded greedily."""
    from ..data.collators import pad_ids

    if temperature and rng is None:
        rng = jax.random.PRNGKey(0)
    ids = list(doc_ids if doc_ids is not None else corpus.keys())
    out: Dict[str, str] = {}
    for i in range(0, len(ids), batch_size):
        chunk = ids[i : i + batch_size]
        b_rng = None
        if rng is not None:
            rng, b_rng = jax.random.split(rng)
        enc = [
            tokenizer(corpus[d], truncation=True,
                      max_length=max_src_len)["input_ids"]
            for d in chunk
        ]
        batch = pad_ids(enc, max_src_len, qg.config.pad_token_id)
        gen = np.asarray(qg.generate(batch["input_ids"], batch["attention_mask"],
                                     max_new_tokens=max_new_tokens,
                                     temperature=temperature,
                                     eos_token_id=eos_token_id, rng=b_rng))
        for d, g in zip(chunk, gen):
            q = _decode_generated(tokenizer, g, eos_token_id)
            if q:
                out[d] = q
    return out


def make_contrast_input(tokenizer, pos_doc: str, neg_doc: str, max_len: int) -> List[int]:
    """'positive: <doc+> negative: <doc−>' encoder sequence."""
    text = f"positive: {pos_doc} negative: {neg_doc}"
    return tokenizer(text, truncation=True, max_length=max_len)["input_ids"]


def build_contrast_pairs(
    run: Dict[str, Dict[str, float]],
    seed_doc_of_query: Dict[str, str],
    top_rank_pos: int = 1,
    neg_rank_range: Tuple[int, int] = (50, 100),
    seed: int = 0,
) -> Iterable[Tuple[str, str, str]]:
    """From a BM25 run over seed queries, yield (qid, pos_doc_id, neg_doc_id):
    pos = the seed query's source doc (or top hit), neg sampled from a lower
    rank band — the reference's contrast-pair construction."""
    import random

    rng = random.Random(seed)
    for qid, docs in run.items():
        ranked = [d for d, _ in sorted(docs.items(), key=lambda kv: kv[1], reverse=True)]
        if not ranked:
            continue
        pos = seed_doc_of_query.get(qid, ranked[0])
        lo, hi = neg_rank_range
        band = [d for d in ranked[lo:hi] if d != pos]
        if not band:
            band = [d for d in ranked[top_rank_pos:] if d != pos]
        if not band:
            continue
        yield qid, pos, rng.choice(band)


def synthesize_training_data(
    qg: QGModel,
    tokenizer,
    corpus: Dict[str, str],
    pairs: Iterable[Tuple[str, str, str]],
    out_path: str,
    max_src_len: int = 256,
    max_new_tokens: int = 24,
    batch_size: int = 16,
    temperature: float = 0.0,
    eos_token_id: int = 1,
    rng=None,
) -> int:
    """Generate contrastive queries for (pos, neg) doc pairs and write
    OpenMatch train jsonl. Returns number of examples written.
    ``temperature`` > 0 needs ``rng`` (auto-seeded when omitted) — see
    generate_seed_queries."""
    from ..data.collators import pad_ids

    if temperature and rng is None:
        rng = jax.random.PRNGKey(0)
    pair_list = list(pairs)
    n = 0
    with open(out_path, "w") as f:
        for i in range(0, len(pair_list), batch_size):
            chunk = pair_list[i : i + batch_size]
            b_rng = None
            if rng is not None:
                rng, b_rng = jax.random.split(rng)
            enc = [
                make_contrast_input(tokenizer, corpus[p], corpus[ng], max_src_len)
                for _, p, ng in chunk
            ]
            batch = pad_ids(enc, max_src_len, qg.config.pad_token_id)
            gen = np.asarray(qg.generate(batch["input_ids"], batch["attention_mask"],
                                         max_new_tokens=max_new_tokens,
                                         temperature=temperature,
                                         eos_token_id=eos_token_id, rng=b_rng))
            for (qid, pos, neg), ids in zip(chunk, gen):
                query = _decode_generated(tokenizer, ids, eos_token_id)
                if not query:
                    continue
                f.write(json.dumps({
                    "query": query,
                    "positives": [corpus[pos]],
                    "negatives": [corpus[neg]],
                }) + "\n")
                n += 1
    return n
