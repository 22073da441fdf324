"""Shared driver plumbing: logging, tokenizer, multi-host init."""

from __future__ import annotations

import argparse
import logging
import os


class DictOrStr(argparse.Action):
    """v1 dataset specs: a plain path, or ``queries=q.tsv,docs=d.tsv,
    trec=run.trec[,qrels=qrels]`` parsed to a dict for V1Dataset's id-spec
    mode (reference v1/OpenMatch/utils.py:5-14).

    The dict branch is taken only when EVERY comma-part is
    ``<spec key>=value`` for the keys V1Dataset's id-spec mode actually
    reads — a plain path that happens to contain '=' (``run=3/x.jsonl``,
    ``/data/run=3/x.jsonl``) stays a string, and a value containing '='
    survives (split once per part)."""

    SPEC_KEYS = frozenset({"queries", "docs", "trec", "qrels"})

    def __call__(self, parser, namespace, values, option_string=None):
        parts = [kv.split("=", 1) for kv in values.split(",")]
        if all(len(p) == 2 and p[0] in self.SPEC_KEYS for p in parts):
            setattr(namespace, self.dest, dict(parts))
        else:
            setattr(namespace, self.dest, values)


def build_v1_tokenizer(args):
    """The v1 CLIs' tokenizer rule in ONE place (train_v1 / inference_v1 /
    gen_feature / meta_train all share it): bert/roberta load the HF
    tokenizer from -vocab or -pretrain (reference v1/train.py:637-645
    loads from the pretrained name), everything else gets the
    WordTokenizer over -vocab/-pretrain GloVe."""
    if args.model in ("bert", "roberta", "electra"):
        from transformers import AutoTokenizer

        src = args.vocab or args.pretrain
        if not src:
            raise ValueError(
                f"-model {args.model} needs -vocab or -pretrain to locate "
                "the HF tokenizer")
        return AutoTokenizer.from_pretrained(src)
    from ..v1.tokenizer import WordTokenizer

    return WordTokenizer(vocab=args.vocab, pretrained=args.pretrain)


def enable_compilation_cache():
    """Persistent XLA compilation cache. First compiles through the remote
    tunnel cost minutes even for trivial programs (measured: 210 s for a
    small matmul, 2.2 s on the cached rerun in a fresh process); every
    driver enables this so repeated invocations with stable shapes are
    fast."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "openmatch_tpu", "xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def setup_logging():
    logging.basicConfig(
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        level=os.environ.get("OPENMATCH_LOG_LEVEL", "INFO"),
    )
    if os.environ.get("OPENMATCH_FORCE_CPU"):
        # the axon TPU plugin force-appends itself to jax_platforms, so
        # JAX_PLATFORMS=cpu alone is ignored; this knob lets any driver
        # run CPU-only (smoke tests, scripts/perf/pipeline_e2e.py --cpu)
        import jax

        jax.config.update("jax_platforms", "cpu")
        return  # CPU graphs compile in seconds; skip the cache
    enable_compilation_cache()


def maybe_init_distributed():
    """Multi-host: initialize the JAX distributed runtime when the standard
    coordinator envs are present (no-op on a single host)."""
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def load_tokenizer(model_args):
    from transformers import AutoTokenizer

    name = model_args.tokenizer_name or model_args.model_name_or_path
    # OM checkpoints store the tokenizer alongside params when available;
    # otherwise fall back to the original HF name.
    return AutoTokenizer.from_pretrained(name, cache_dir=model_args.cache_dir, use_fast=True)


def epochs_iterator(dataset, collator, batch_size: int, num_epochs: int, seed: int):
    """Epoch-looped batched stream for trainers; hashed seed mirrors the
    reference's per-epoch sampling (train_dataset.py:115-119)."""
    from ..data.loader import batched, prefetch

    hashed_seed = hash(seed) % (2**31)
    for epoch in range(max(num_epochs, 1)):
        stream = batched(
            dataset.epoch_iterator(epoch, hashed_seed), batch_size, collator, drop_last=True
        )
        yield from prefetch(stream, depth=4)
