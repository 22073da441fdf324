"""DR train-step throughput on the real chip.

Training is the reference's core workload (docs/dr-msmarco-passage.md
recipe: bs 8 queries x 8 passages per device, q 32 / p 128) but
docs/performance.md measured only encode/search/rerank — this fills the
table. Measures one jitted SPMD train step (DRTrainer, 1-device mesh,
bf16 compute / fp32 params+optimizer) for BERT-base at the recipe shape
and at TPU-sized batches:

    python scripts/perf/train_bench.py [BATCH] [N_PASSAGES] [--grad-cache]

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
    from openmatch_tpu.models.dr_model import DRModel
    from openmatch_tpu.train.dr_trainer import DRTrainer

    model = DRModel(encoder_config=BertConfig(add_pooler=False),
                    dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    args = TrainingArguments(
        negatives_x_device=True, grad_cache=use_gc,
        per_device_train_batch_size=B, max_steps=1000)
    trainer = DRTrainer(model, params, args, total_steps=1000)

    rng = np.random.RandomState(0)
    batch = {
        "query": {
            "input_ids": jnp.asarray(
                rng.randint(1, 30000, size=(B, QL)), jnp.int32),
            "attention_mask": jnp.ones((B, QL), jnp.int32),
        },
        "passage": {
            "input_ids": jnp.asarray(
                rng.randint(1, 30000, size=(B * NP, PL)), jnp.int32),
            "attention_mask": jnp.ones((B * NP, PL), jnp.int32),
        },
    }

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

    tag = "grad_cache" if use_gc else "plain"
    print(f"{tag}: {dt * 1e3:.1f} ms/step at B={B} x {NP} passages "
          f"(q{QL}/p{PL}) -> {B / dt:,.1f} queries/s/chip, "
          f"{B * NP / dt:,.1f} passages/s/chip", flush=True)


if __name__ == "__main__":
    main()
