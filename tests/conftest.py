"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
imports anywhere, so multi-chip sharding logic is exercised without TPUs
(SURVEY.md §4: JAX's stand-in for a fake distributed backend)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

# Disable the persistent XLA compilation cache for the suite: drivers
# call enable_compilation_cache(), which otherwise makes every test run
# read/write a cache directory shared with any concurrently-running TPU
# process. Suite runs under heavy concurrent load have segfaulted inside
# the cache's zstd read and write paths (and once in backend_compile with
# the cache already off — XLA:CPU under contention is not blameless), so
# tests keep the surface minimal: CPU test graphs compile in seconds and
# the cache buys them nothing. TPU drivers keep it (remote compiles cost
# minutes).

# The environment ships a TPU plugin that force-appends itself to
# jax_platforms even when JAX_PLATFORMS=cpu is set; an explicit config
# update takes priority over it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# fast/slow split (VERDICT r3 next #9): `pytest -m "not slow"` is the
# default dev loop (<8 min); the full 310 keep running in CI-equivalent
# mode (`pytest tests/ -q`, ~24 min, dominated by SPMD train-step
# compiles and interpret-mode Pallas). Centralized here instead of
# per-file decorators so the list is re-tunable from one `--durations`
# run; entries are nodeid substrings (a trailing "::" marks a class).
# Measured r4: the marked set is ~1050 s of the 1454 s total.
# ---------------------------------------------------------------------------
_SLOW_NODEID_PARTS = (
    "test_pallas_mips.py::TestBlockTopk::",
    "test_training.py::TestDropoutTraining::",
    "test_training.py::TestGradCache",
    "test_training.py::TestDRTrainer::test_checkpoint_resume",
    "test_training.py::TestDRTrainer::test_global_negatives_semantics",
    "test_training.py::TestDRTrainer::test_loss_decreases[grad_cache]",
    "test_training.py::TestDRTrainer::test_loss_decreases[global]",
    "test_mips.py::TestQueryShardedSearch::test_searcher_query_partition_segmented_pallas",
    "test_mips.py::TestShardedSearch::test_searcher_segmented_pallas_index",
    "test_reinfoselect_mode.py::TestCLI::test_train_v1_reinfoselect_end_to_end",
    "test_reinfoselect_mode.py::TestTrainerLoop::",
    "test_meta_train_mode.py::TestCLI::",
    "test_meta_train_mode.py::TestMetaTrainer::",
    "test_long_doc.py::TestEDRMEndToEnd::",
    "test_losses.py::TestDualContrastive::test_trainer_flag",
    "test_mesh.py::TestShardBatchMultiHost::test_trainer_step_unchanged_under_multihost_path",
    "test_tp.py::TestTPTraining::",
    "test_rr_model.py::TestLengthBucketedRerank::test_mixed_length_run_matches_direct",
    "test_ance.py::TestAlternating::test_refresh_improves_and_swaps",
    "test_qg.py::TestSynthesisPipeline::test_pipeline_produces_trainable_jsonl",
    "test_qg.py::TestQGTrainingAndGeneration::test_overfits_and_generates_memorized_target",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(part in item.nodeid for part in _SLOW_NODEID_PARTS):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules. A full-suite run
    accumulates hundreds of XLA:CPU executables in one process and
    started segfaulting inside backend_compile of the late train-step /
    grad-cache graphs (test_training.py passes in isolation — the crash
    needs ~170 prior tests' worth of state). Per-module clearing keeps
    the resident compiler state bounded; re-compiles cost seconds on
    CPU."""
    yield
    jax.clear_caches()


@pytest.fixture(autouse=True, scope="session")
def _small_rescore_kt():
    """Force the gather-rescore kernel's kt (selected blocks per grid
    step) from the production 64 down to 16 for the whole suite: the
    kernel body unrolls kt*8 DMA copies, and in interpret mode tracing a
    512-copy body dominates test wall-clock (measured ~4x: the 3-segment
    storage test dropped 188s -> ~40s). kt only changes the k padding and
    the grid split — outputs are bitwise identical (pad columns are
    masked), so coverage is unchanged. kt*8 must stay a 128 multiple."""
    import openmatch_tpu.ops.pallas_mips as pm

    real = pm.pallas_gather_rescore

    def forced_kt(queries, plain, bids, kt=64, pipeline=False):
        return real(queries, plain, bids, kt=16, pipeline=pipeline)

    pm.pallas_gather_rescore = forced_kt
    yield
    pm.pallas_gather_rescore = real


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devices = np.array(jax.devices()).reshape(8)
    with Mesh(devices, axis_names=("data",)) as mesh:
        yield mesh
