"""DR/RR train-step throughput on the real chip.

Training is the reference's core workload (docs/dr-msmarco-passage.md
recipe: bs 8 queries x 8 passages per device, q 32 / p 128; the flagship
v2 model is T5-base-scaled, dr-msmarco-passage.md:66-207; the monoT5
reranker trains at bs 32 pairs, rr-msmarco-passage.md:83-141). Measures
one jitted SPMD train step (DRTrainer/RRTrainer, 1-device mesh, bf16
compute / fp32 params+optimizer) at the recipe shape and at TPU-sized
batches:

    python scripts/perf/train_bench.py [BATCH] [N_PASSAGES] \
        [--grad-cache] [--t5] [--rr]

--t5 swaps the BERT-base tower for the full t5-base encoder (DR mode) or
the monoT5 encoder+1-step-decoder (with --rr). --rr benches the reranker
step over [B] pos/neg pairs of length q+p+2 = 162 (NP is ignored). The
scaled-weights recipe (scripts/scale_t5_weights.py) only rescales values,
so its step time is identical to --t5 by construction.

One config per process (clean HBM, one tunnel compile). The step runs
ITERS times inside one dispatched fori_loop (the ~27 ms/dispatch tunnel
overhead would otherwise be 10-25% of a step); the loop carries the full
TrainState, so each iteration is a real donate-free param+optimizer
update at training data flow.
"""

import sys
import time

import numpy as np

ITERS = 8


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(argv[0]) if argv else 8
    NP = int(argv[1]) if len(argv) > 1 else 8
    use_gc = "--grad-cache" in sys.argv
    use_t5 = "--t5" in sys.argv
    use_rr = "--rr" in sys.argv
    QL, PL = 32, 128

    sys.path.insert(0, "/root/repo")
    from openmatch_tpu.drivers.common import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if "--cpu" in sys.argv:  # smoke-test mode (the axon plugin ignores
        jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS=cpu)
    import jax.numpy as jnp

    from openmatch_tpu.config import TrainingArguments
    from openmatch_tpu.models.bert import BertConfig
    from openmatch_tpu.models.t5 import T5Config

    rng = np.random.RandomState(0)
    if "--tiny" in sys.argv:  # CPU smoke shapes
        enc_cfg = (T5Config(d_model=16, d_kv=8, d_ff=32, num_layers=1,
                            num_decoder_layers=1, num_heads=2, vocab_size=64)
                   if use_t5 else
                   BertConfig(vocab_size=64, hidden_size=16,
                              num_hidden_layers=1, num_attention_heads=2,
                              intermediate_size=32, add_pooler=False))
        vocab = 64
    elif use_t5:
        enc_cfg = T5Config()  # t5-base geometry
        vocab = 32000
    else:
        enc_cfg = BertConfig(add_pooler=False)
        vocab = 30000

    if use_rr:
        from openmatch_tpu.models.rr_model import RRModel
        from openmatch_tpu.train.rr_trainer import RRTrainer

        L = QL + PL + 2  # reference PairCollator pair length
        model = RRModel(
            encoder_config=enc_cfg,
            backbone_type="t5" if use_t5 else "bert",
            pos_token_id=3, neg_token_id=4,
            head_in_dim=getattr(enc_cfg, "hidden_size", None)
            or enc_cfg.d_model,
            loss_fn_str="ce" if use_t5 else "bce",
            dtype=jnp.bfloat16)
        params = model.init_params(jax.random.PRNGKey(0))
        args = TrainingArguments(per_device_train_batch_size=B,
                                 max_steps=1000)
        trainer = RRTrainer(model, params, args, total_steps=1000)
        pair = lambda: {
            "input_ids": jnp.asarray(
                rng.randint(1, vocab, size=(B, L)), jnp.int32),
            "attention_mask": jnp.ones((B, L), jnp.int32),
        }
        batch = {"pos_pairs": pair(), "neg_pairs": pair()}
        # each of the 2B units is ONE pos- or neg-pair sequence; calling
        # them "pairs/s" would double the apparent pair rate (the recipe's
        # unit is B pairs/step)
        units = ("seqs", 2 * B)
    else:
        from openmatch_tpu.models.dr_model import DRModel
        from openmatch_tpu.train.dr_trainer import DRTrainer

        # t5_encdec = the flagship recipe's DEFAULT T5 DR semantics (rep
        # is decoder token 0 of one decoder step; the decoder adds ~1/128
        # of the encoder FLOPs at p128)
        model = DRModel(encoder_config=enc_cfg,
                        backbone_type="t5_encdec" if use_t5 else "bert",
                        dtype=jnp.bfloat16)
        params = model.init_params(jax.random.PRNGKey(0))
        args = TrainingArguments(
            negatives_x_device=True, grad_cache=use_gc,
            per_device_train_batch_size=B, max_steps=1000)
        trainer = DRTrainer(model, params, args, total_steps=1000)
        batch = {
            "query": {
                "input_ids": jnp.asarray(
                    rng.randint(1, vocab, size=(B, QL)), jnp.int32),
                "attention_mask": jnp.ones((B, QL), jnp.int32),
            },
            "passage": {
                "input_ids": jnp.asarray(
                    rng.randint(1, vocab, size=(B * NP, PL)), jnp.int32),
                "attention_mask": jnp.ones((B * NP, PL), jnp.int32),
            },
        }
        units = ("passages", B * NP)

    # ITERS chained real updates in ONE dispatch; jit-of-jit ignores the
    # inner step's donation, so the carry threads cleanly
    step_fn = trainer._step_fn

    @jax.jit
    def loop(state, batch):
        def body(i, st):
            st2, _ = step_fn(st, batch)
            return st2

        return jax.lax.fori_loop(0, ITERS, body, state)

    with trainer.mesh:
        state = loop(trainer.state, batch)  # warm + compile
        np.asarray(jax.tree.leaves(state.params)[0].ravel()[0:1])
        t0 = time.time()
        state = loop(state, batch)
        np.asarray(jax.tree.leaves(state.params)[0].ravel()[0:1])
        dt = (time.time() - t0) / ITERS

    tag = "".join([
        "rr-" if use_rr else "", "t5" if use_t5 else "bert",
        "-grad_cache" if use_gc else ""])
    name, n_units = units
    shape = (f"B={B} pairs (L={QL + PL + 2})" if use_rr
             else f"B={B} x {NP} passages (q{QL}/p{PL})")
    print(f"{tag}: {dt * 1e3:.1f} ms/step at {shape} "
          f"-> {B / dt:,.1f} queries/s/chip, "
          f"{n_units / dt:,.1f} {name}/s/chip", flush=True)


if __name__ == "__main__":
    main()
