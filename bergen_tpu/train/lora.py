"""LoRA adapters for the llama family (reference trains via peft
``LoraConfig(target_modules='all-linear')`` + HF Trainer, ``modules/rag.py:
602-613``).  Here adapters are extra ``lora_a``/``lora_b`` leaves inside each
linear's param dict; ``llama._proj`` applies ``x@A@B * scale`` on the fly, the
optimizer is masked to adapter leaves only, and ``merge`` folds the adapters
into the base kernels for inference."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _is_linear(d) -> bool:
    return isinstance(d, dict) and "kernel" in d


def init_lora(params: Dict[str, Any], rank: int, alpha: float, key,
              dtype=jnp.float32) -> Dict[str, Any]:
    """Attach zero-initialised adapters to every linear ('all-linear'):
    A ~ N(0, 1/rank), B = 0 so training starts at the base model."""
    flat = []

    def visit(node, path):
        if path and path[0] == "lm_head":
            return  # peft 'all-linear' excludes the output head
        if _is_linear(node):
            flat.append((path, node))
            return
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, path + (k,))
        elif isinstance(node, list):
            for i, v in enumerate(node):
                visit(v, path + (i,))

    visit(params, ())
    keys = jax.random.split(key, max(len(flat), 1))
    for (path, node), k in zip(flat, keys):
        d_in, d_out = node["kernel"].shape
        node["lora_a"] = (
            jax.random.normal(k, (d_in, rank), dtype) / jnp.sqrt(rank)
        )
        node["lora_b"] = jnp.zeros((rank, d_out), dtype)
        node["lora_scale"] = jnp.asarray(alpha / rank, dtype)
    return params


def lora_mask(params) -> Any:
    """Pytree of booleans: True only on adapter leaves (for optax.masked)."""

    def mask(path, leaf):
        names = {getattr(k, "key", getattr(k, "idx", None)) for k in path}
        return bool(names & {"lora_a", "lora_b"})

    return jax.tree_util.tree_map_with_path(mask, params)


def merge(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold W <- W + A@B*scale and drop the adapter leaves (inference)."""

    def visit(node):
        if _is_linear(node) and "lora_a" in node:
            delta = (node["lora_a"] @ node["lora_b"]) * node["lora_scale"]
            node["kernel"] = (
                node["kernel"].astype(jnp.float32) + delta.astype(jnp.float32)
            ).astype(node["kernel"].dtype)
            for k in ("lora_a", "lora_b", "lora_scale"):
                node.pop(k)
            return
        if isinstance(node, dict):
            for v in node.values():
                visit(v)
        elif isinstance(node, list):
            for v in node:
                visit(v)

    visit(params)
    return params


def extract_adapters(params) -> Dict[str, Any]:
    """Flatten adapter leaves to {dotted_path: np.ndarray} for checkpointing."""
    import numpy as np

    out = {}

    def visit(node, path):
        if _is_linear(node) and "lora_a" in node:
            out[path + ".lora_a"] = np.asarray(node["lora_a"])
            out[path + ".lora_b"] = np.asarray(node["lora_b"])
            return
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, f"{path}.{k}" if path else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                visit(v, f"{path}.{i}")

    visit(params, "")
    return out


def load_adapters(params, flat: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of extract_adapters onto a lora-initialised tree."""

    def visit(node, path):
        if _is_linear(node) and "lora_a" in node:
            node["lora_a"] = jnp.asarray(flat[path + ".lora_a"])
            node["lora_b"] = jnp.asarray(flat[path + ".lora_b"])
            return
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, f"{path}.{k}" if path else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                visit(v, f"{path}.{i}")

    visit(params, "")
    return params
