"""Weight-streaming packed-int4 Pallas matmul: numerics vs the XLA dequant
path, integration through llama._proj, and end-to-end int4 generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bergen_tpu.models import convert, llama
from bergen_tpu.ops import int4_matmul

INTERPRET = jax.default_backend() != "tpu"


def _pack(rng, K, N, group=128):
    w = rng.normal(size=(K, N)).astype(np.float32)
    node = {"kernel": jnp.asarray(w)}
    convert_tree = {"n": node}
    convert.quantize_tree_int4(convert_tree, min_size=1, group=group,
                               packed=True)
    return node["kernel_q4p"], node["kernel_scale4"]


def _xla_ref(x, wp, scales):
    q4 = convert.unpack_int4(wp)
    w = convert.dequantize_int4(q4, scales, jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w,
                   preferred_element_type=jnp.float32)


def _f32_ref(x, wp, scales):
    # exact dequant: the dot-identity kernel applies group scales to f32
    # dot outputs, so its numerics track the f32-dequant product (bf16
    # activation rounding only), NOT the XLA path's bf16 weight rounding
    q4 = convert.unpack_int4(wp)
    w = convert.dequantize_int4(q4, scales, jnp.float32)
    xb = x.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.dot(xb, w, preferred_element_type=jnp.float32)


FORMS = ("3dot", "stacked", "duo", "mono", "auto")


@pytest.mark.parametrize("form", FORMS)
@pytest.mark.parametrize("M,K,N,group", [
    (4, 256, 256, 128),
    (32, 512, 384, 128),
    (3, 256, 512, 64),     # odd M, small group
    (130, 512, 256, 128),  # M crosses one block row
])
def test_matches_f32_dequant(M, K, N, group, form):
    rng = np.random.default_rng(0)
    wp, scales = _pack(rng, K, N, group)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    assert int4_matmul.supports(K, N, scales.shape[0])
    got = int4_matmul.matmul_int4_packed(x, wp, scales, interpret=INTERPRET,
                                         form=form)
    ref = _f32_ref(x, wp, scales)
    # only f32 accumulation order differs (per-group dots + identity combine)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_close_to_xla_bf16_path():
    """The production XLA fallback (bf16 weight dequant) and the kernel must
    agree within the fallback's own bf16 weight-rounding noise — decode may
    mix the two paths across projections (supports() gating)."""
    rng = np.random.default_rng(0)
    M, K, N, group = 32, 512, 384, 128
    wp, scales = _pack(rng, K, N, group)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    got = int4_matmul.matmul_int4_packed(x, wp, scales, interpret=INTERPRET)
    ref = _xla_ref(x, wp, scales)
    # bf16 weight rounding: |dw| <= s*7*2^-9 per element, ~sqrt(K) growth
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=0.35)


@pytest.mark.parametrize("form", FORMS)
def test_exact_on_integer_inputs(form):
    """Integer activations x int4 weights with unit scales: every product
    and partial sum is exactly representable — the kernel must be bitwise
    equal to the mathematical result, proving the unpack (sign extension,
    row parity, group mapping) is exact.  For duo/mono the rebalanced
    activation operand xe - xo/16 is exactly representable in bf16 at
    these magnitudes, so exactness carries over."""
    rng = np.random.default_rng(1)
    K, N = 256, 256
    q = rng.integers(-7, 8, size=(K, N)).astype(np.float32)
    scales = jnp.ones((K // 128, N), jnp.float32)
    q8 = q.astype(np.int8)
    # dot-identity encoding: stored high nibble = hi - (lo < 0); negative
    # low nibbles exercise the m-correction the identity must cancel
    lo, hi = q8[0::2], q8[1::2]
    wp = jnp.asarray(((hi - (lo < 0)) << 4) | (lo & 0x0F), jnp.int8)
    x = jnp.asarray(rng.integers(-4, 5, size=(8, K)).astype(np.float32))
    got = int4_matmul.matmul_int4_packed(x, wp, scales, interpret=INTERPRET,
                                         form=form)
    want = np.asarray(x, np.float64) @ np.asarray(q, np.float64)
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.float32))


def test_supports_gates_bad_shapes():
    assert not int4_matmul.supports(255, 256, 5)    # odd K
    assert not int4_matmul.supports(256, 100, 2)    # N not 128-multiple
    assert int4_matmul.supports(5632, 2048, 44)     # tinyllama down_proj


def test_proj_routes_through_kernel(monkeypatch):
    """llama._proj must use the kernel when enabled and match the XLA path."""
    rng = np.random.default_rng(2)
    node = {"kernel": jnp.asarray(
        rng.normal(size=(256, 256)).astype(np.float32))}
    tree = {"n": node}
    convert.quantize_tree_int4(tree, min_size=1, group=128, packed=True)
    x = jnp.asarray(rng.normal(size=(2, 5, 256)).astype(np.float32))

    monkeypatch.setattr(llama, "USE_INT4_KERNEL", False)
    ref = llama._proj(node, x)
    monkeypatch.setattr(llama, "USE_INT4_KERNEL", True)
    called = {}
    orig = int4_matmul.matmul_int4_packed

    def spy(xx, wp, sc, **kw):
        called["yes"] = True
        return orig(xx, wp, sc, interpret=INTERPRET)

    monkeypatch.setattr(int4_matmul, "matmul_int4_packed", spy)
    got = llama._proj(node, x)
    assert called.get("yes")
    # kernel rounds activations to bf16 (the TPU contract); the CPU XLA
    # reference keeps f32 activations — routing + coarse numerics only,
    # exact parity is test_matches_xla_dequant
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.12, atol=0.6)


def test_int4_generation_kernel_vs_xla(monkeypatch):
    """Greedy generation with the kernel path must produce the same tokens
    as the XLA dequant path (same quantized weights)."""
    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=256, max_position_embeddings=128,
    )
    params = llama.init(jax.random.PRNGKey(0), cfg)
    convert.quantize_tree_int4(params, min_size=1, group=64, packed=True)
    rng = np.random.default_rng(3)
    ii = jnp.asarray(rng.integers(3, 250, size=(2, 12)), jnp.int32)
    am = jnp.ones((2, 12), jnp.int32)

    monkeypatch.setattr(llama, "USE_INT4_KERNEL", False)
    ref = llama.greedy_generate(params, cfg, ii, am, 8, eos_token_id=-1,
                                pad_token_id=0, cache_dtype=jnp.float32)
    monkeypatch.setattr(llama, "USE_INT4_KERNEL", True)
    monkeypatch.setattr(llama, "INT4_KERNEL_INTERPRET", INTERPRET)
    got = llama.greedy_generate(params, cfg, ii, am, 8, eos_token_id=-1,
                                pad_token_id=0, cache_dtype=jnp.float32)
    assert np.asarray(got).tolist() == np.asarray(ref).tolist()
