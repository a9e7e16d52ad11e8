"""Test configuration: force JAX onto a virtual 8-device CPU mesh so all
sharding/collective code paths run without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # forced (not setdefault): the login
# shell exports JAX_PLATFORMS=axon, and subprocesses spawned by tests must
# inherit the CPU forcing or they hang retrying the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
os.environ.setdefault("HF_DATASETS_DISABLE_PROGRESS_BARS", "1")
# Silence the XLA:CPU AOT loader's per-entry machine-feature errors when
# reloading persistent-cache entries (the compile records prefer-no-scatter/
# prefer-no-gather pseudo-features the host check doesn't list; on this fixed
# single host the executables are identical).  Forced, not setdefault: the
# login shell exports level 1, which still prints E-level spam.  Genuine
# failures surface as Python exceptions regardless.  Must precede XLA C++
# init.
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
# before any backend initialisation.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (many tiny
# models, each jitted once), so caching compiled executables across runs cuts
# the full-suite wall clock roughly in half after the first populate run.
# Entries under 0.5 s of compile time are not worth the disk churn.
if not os.environ.get("BERGEN_TPU_NO_TEST_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402

# Modules dominated by model-forward compile time — excluded from the fast
# gate (`pytest -m "not slow"`, < 5 min; full suite runs nightly/CI-full).
SLOW_MODULES = {
    "test_pipeline_e2e", "test_serving", "test_provence_training",
    "test_quantization", "test_beam_sampling", "test_m2m100", "test_t5",
    "test_gemma", "test_mixtral", "test_qwen2", "test_llama",
    "test_compression_generators", "test_context_processors",
    "test_training", "test_tensor_parallel", "test_evaluate_llm_cli",
    "test_flash_llama", "test_flash_encoder", "test_deberta",
    "test_dense_retrieval", "test_remote_encoders", "test_evaluators",
    "test_paged_serving", "test_paged_llama",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy tests excluded from the fast gate"
    )


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
