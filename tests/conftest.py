"""Test configuration: force JAX onto a virtual 8-device CPU mesh so all
sharding/collective code paths run without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
os.environ.setdefault("HF_DATASETS_DISABLE_PROGRESS_BARS", "1")

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
# before any backend initialisation.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

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
