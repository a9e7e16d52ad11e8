"""JAX LLM generator — jitted prefill + scan decode, TP over the mesh.

Stands in for both reference generator engines: the HF torch path
(``models/generators/llm.py``: greedy ``model.generate``, left padding,
bf16) and the vLLM engine (``models/generators/vllm.py``: tensor parallel).
One generator class drives the Llama-family JAX model with a static-shape KV
cache; tensor parallelism is a mesh axis (``tp`` arg), not a separate engine.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from bergen_tpu.models import convert, llama
from bergen_tpu.models.core import make_buckets, length_bucket
from bergen_tpu.models.generators.base import Generator
from bergen_tpu.parallel import get_mesh


class LLM(Generator):
    def __init__(
        self,
        model_name: str,
        batch_size: int = 8,
        max_new_tokens: int = 64,
        max_doc_len: int = 10**10,
        max_length: int | None = 2048,
        use_middle_truncation: bool = False,
        prompt=None,
        quantization: str | None = None,  # accepted for config parity; bf16 on TPU
        tp: int = 1,
        gguf_file: str | None = None,  # GGUF checkpoints (reference hf.yaml:
        # gguf_file), dequantized by transformers at load
        serve: bool = False,  # route generation through the continuous-
        # batching GenerationServer (the vLLM-engine stand-in) instead of
        # static length-bucketed batches
        max_slots: int = 32,  # measured sweet spot for the aligned-cursor
        # drain on v5e (documentation/performance.md serving table)
        kv_cache: str = "uniform",  # 'paged' = vLLM-style page-pool KV
        # (serve/paged.py): slots hold pages ~ their ACTUAL length, so the
        # same HBM admits more concurrent slots on mixed-length workloads

        # sampling / search (reference vllm.py:61-78 SamplingParams):
        # temperature 0 = greedy; use_beam_search + best_of>1 = beam search
        temperature: float = 0.0,
        top_p: float = 1.0,
        use_beam_search: bool = False,
        best_of: int = 1,
        num_beams: int | None = None,  # alias for best_of w/ beam search
        length_penalty: float = 1.0,
        seed: int = 0,
        dtype: str | None = None,  # 'f32'/'bf16' force; None = bf16 on TPU,
        # f32 elsewhere. f32-on-TPU exists for cross-backend parity checks.
        w8a8_outlier_threshold: float = 10.0,  # max per-token absmax/rms on
        # the calibration batch before w8a8 falls back to weight-only int8
        **_ignored,
    ):
        super().__init__(
            model_name=model_name, batch_size=batch_size,
            max_new_tokens=max_new_tokens, max_doc_len=max_doc_len,
            max_length=max_length, use_middle_truncation=use_middle_truncation,
        )
        from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer

        self.prompt = prompt
        _load_kw = {"gguf_file": gguf_file} if gguf_file else {}
        self.tokenizer = AutoTokenizer.from_pretrained(model_name, **_load_kw)
        self.tokenizer.padding_side = "left"
        # pad priority: bos > pad > eos (reference llm.py:86-92)
        self.tokenizer.pad_token = (
            self.tokenizer.bos_token
            or self.tokenizer.pad_token
            or self.tokenizer.eos_token
        )

        hf_cfg = AutoConfig.from_pretrained(model_name, **_load_kw)
        self.cfg = llama.LlamaConfig.from_hf(hf_cfg)

        on_tpu = jax.default_backend() == "tpu"
        if dtype is not None:
            self.dtype = {"f32": jnp.float32, "float32": jnp.float32,
                          "bf16": jnp.bfloat16}[dtype]
        else:
            self.dtype = jnp.bfloat16 if on_tpu else jnp.float32
        hf_model = AutoModelForCausalLM.from_pretrained(model_name, **_load_kw)
        params = convert.llama_from_hf(hf_model.state_dict(), self.cfg.num_layers)
        del hf_model
        if quantization in ("int8_mxu", "w8a8"):
            # W8A8 quantizes ACTIVATIONS per row; real LLMs can carry
            # emergent outlier channels (the reason LLM.int8 exists) that a
            # per-row scale would crush.  Calibrate on a real forward pass
            # before committing: above the threshold, fall back to
            # weight-only int8 (identical HBM savings, bf16 matmul).
            params = convert.to_device_tree(params, dtype=self.dtype)
            ratio = self._calibrate_outliers(params)
            if ratio > w8a8_outlier_threshold:
                import logging

                logging.getLogger(__name__).warning(
                    "w8a8 calibration: activation outlier ratio %.1f > "
                    "threshold %.1f — falling back to weight-only int8 "
                    "(per-row activation quantization would crush the "
                    "non-outlier channels)", ratio, w8a8_outlier_threshold,
                )
                quantization = "int8"
        if quantization == "int8":
            params = convert.quantize_tree_int8(params)
        elif quantization in ("int8_mxu", "w8a8"):
            # W8A8: weights stay int8 in HBM and the matmuls run on the
            # int8 MXU (2x peak, half the decode weight reads); activations
            # are per-row quantized on the fly — see llama._proj
            params = convert.quantize_tree_int8(params, mxu=True)
        elif quantization == "int4":
            # true 4-bit weight-only, group-wise scales.  Hand-packed
            # two-nibbles-per-int8-byte storage (same HBM bytes as jnp.int4)
            # because not every TPU runtime accepts S4 jit arguments
            params = convert.quantize_tree_int4(params, packed=True)

        if num_beams is not None:
            use_beam_search, best_of = num_beams > 1, num_beams
        if use_beam_search and temperature != 0:
            raise ValueError(
                f"beam search requires temperature = 0, not {temperature}"
            )
        self.temperature = temperature
        self.top_p = top_p
        self.use_beam_search = use_beam_search
        self.best_of = best_of
        self.length_penalty = length_penalty
        self.seed = seed

        self.mesh = get_mesh(model=tp)
        params = convert.to_device_tree(params, dtype=self.dtype)
        if tp > 1:
            specs = llama.param_shardings(params)

            def place(x, s):
                # fall back to replication for dims the TP axis can't divide
                # (e.g. an odd vocab on lm_head)
                for dim, axis in enumerate(s):
                    if axis is not None and x.shape[dim] % tp != 0:
                        s = jax.sharding.PartitionSpec()
                        break
                return jax.device_put(x, NamedSharding(self.mesh, s))

            params = jax.tree.map(
                place, params, specs,
                is_leaf=lambda x: isinstance(x, jnp.ndarray),
            )
        self.params = params
        self.buckets = make_buckets(max_length or 2048)
        cfg = self.cfg

        def _gen_fn(params, input_ids, attention_mask, max_new_tokens,
                    eos_token_id, pad_token_id, cache_dtype):
            return llama.greedy_generate(
                params, cfg, input_ids, attention_mask, max_new_tokens,
                eos_token_id, pad_token_id, cache_dtype,
            )

        self._gen = jax.jit(
            _gen_fn,
            static_argnames=("max_new_tokens", "eos_token_id", "pad_token_id",
                             "cache_dtype"),
        )

        def _beam_fn(params, input_ids, attention_mask, max_new_tokens,
                     num_beams, eos_token_id, pad_token_id, length_penalty,
                     cache_dtype):
            return llama.beam_generate(
                params, cfg, input_ids, attention_mask, max_new_tokens,
                num_beams, eos_token_id, pad_token_id, length_penalty,
                cache_dtype,
            )

        self._beam = jax.jit(
            _beam_fn,
            static_argnames=("max_new_tokens", "num_beams", "eos_token_id",
                             "pad_token_id", "length_penalty", "cache_dtype"),
        )

        def _sample_fn(params, input_ids, attention_mask, rng_key,
                       max_new_tokens, eos_token_id, pad_token_id,
                       temperature, top_p, cache_dtype):
            return llama.sample_generate(
                params, cfg, input_ids, attention_mask, max_new_tokens,
                eos_token_id, pad_token_id, temperature, top_p, rng_key,
                cache_dtype,
            )

        self._sample = jax.jit(
            _sample_fn,
            static_argnames=("max_new_tokens", "eos_token_id", "pad_token_id",
                             "temperature", "top_p", "cache_dtype"),
        )

        def _prefill_logits_fn(params, input_ids, attention_mask):
            B, S = input_ids.shape
            cache = llama.init_cache(cfg, B, S, dtype=self.dtype)
            positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
            causal = jnp.tril(jnp.ones((S, S), bool))
            mask = jnp.zeros((B, S, S), bool) | (
                causal[None] & attention_mask[:, None, :].astype(bool)
            )
            logits, _ = llama.forward(params, cfg, input_ids, positions, cache, mask)
            return logits[:, -1].astype(jnp.float32)  # next-token logits

        self._prefill_logits = jax.jit(_prefill_logits_fn)

        self.server = None
        if serve:
            from bergen_tpu.serve.engine import GenerationServer
            from bergen_tpu.serve.paged import PagedGenerationServer

            # reserve headroom for generated tokens beyond the prompt bucket
            serve_len = (max_length or 2048) + max_new_tokens + 1
            common = dict(
                params=self.params, cfg=self.cfg,
                eos_token_id=self.tokenizer.eos_token_id,
                pad_token_id=self.tokenizer.pad_token_id,
                max_slots=max_slots, max_len=serve_len,
                dtype=self.dtype,
                # sampling runs inside the engine's decode step (round 2
                # silently bypassed the server for temperature>0)
                temperature=temperature, top_p=top_p, seed=seed,
            )
            if kv_cache == "paged":
                # page-pool KV: no per-slot max_len reservation; TP shards
                # the pools/tails over the mesh 'model' axis (kv heads) and
                # decodes through the XLA paged composition
                self.server = PagedGenerationServer(
                    mesh=self.mesh if tp > 1 else None, **common
                )
            elif kv_cache == "uniform":
                self.server = GenerationServer(
                    prompt_buckets=tuple(self.buckets),
                    mesh=self.mesh if tp > 1 else None,
                    **common,
                )
            else:
                raise ValueError(f"unknown kv_cache mode: {kv_cache!r}")

    # ------------------------------------------------------------------ #

    _CALIBRATION_TEXTS = [
        "The quick brown fox jumps over the lazy dog near the river bank .",
        "In 1969 astronauts first landed on the moon during the mission .",
        "Paris is the capital of France and Berlin the capital of Germany .",
        "What is the name of the longest river on the southern continent ?",
    ]

    def _calibrate_outliers(self, params) -> float:
        """Max per-token absmax/rms of the layer inputs over one real
        forward pass on a small calibration batch — the LLM.int8
        emergent-outlier signal that decides whether per-row activation
        quantization (w8a8) is numerically safe for this checkpoint."""
        enc = self.tokenizer(self._CALIBRATION_TEXTS, truncation=True,
                             max_length=32)
        L = min(32, min(len(t) for t in enc["input_ids"]))
        ii = np.asarray([t[:L] for t in enc["input_ids"]], np.int32)
        B = ii.shape[0]
        cache = llama.init_cache(self.cfg, B, L, dtype=self.dtype)
        positions = jnp.broadcast_to(jnp.arange(L), (B, L)).astype(jnp.int32)
        mask = jnp.broadcast_to(jnp.tril(jnp.ones((L, L), bool)), (B, L, L))
        _, _, stats = jax.jit(
            functools.partial(llama.forward, cfg=self.cfg,
                              collect_stats=True)
        )(params, input_ids=jnp.asarray(ii), positions=positions,
          cache=cache, attn_mask=mask)
        return float(jnp.max(stats))

    def _tokenize_left_pad(self, prompts: List[str]):
        enc = self.tokenizer(
            prompts, truncation=True, max_length=self.max_length, padding=False
        )
        lens = [len(x) for x in enc["input_ids"]]
        bucket = length_bucket(max(lens), self.buckets)
        pad_id = self.tokenizer.pad_token_id
        B = len(prompts)
        ii = np.full((B, bucket), pad_id, dtype=np.int32)
        am = np.zeros((B, bucket), dtype=np.int32)
        for r, ids in enumerate(enc["input_ids"]):
            ids = ids[-bucket:]
            ii[r, bucket - len(ids):] = ids
            am[r, bucket - len(ids):] = 1
        return ii, am

    def first_token_logits(self, prompts: List[str]) -> np.ndarray:
        """Logits over the vocab for the first to-be-generated token [B, V] —
        the LLM-judge's logits-interpolation mode reads these
        (reference models/evaluators/llm.py:165-180)."""
        ii, am = self._tokenize_left_pad(prompts)
        out = self._prefill_logits(
            self.params, jnp.asarray(ii), jnp.asarray(am)
        )
        return np.asarray(out)

    def generate(self, prompts: List[str]) -> List[str]:
        if self.use_beam_search and self.best_of > 1:
            ii, am = self._tokenize_left_pad(prompts)
            toks = self._beam(
                self.params, jnp.asarray(ii), jnp.asarray(am),
                max_new_tokens=self.max_new_tokens, num_beams=self.best_of,
                eos_token_id=self.tokenizer.eos_token_id,
                pad_token_id=self.tokenizer.pad_token_id,
                length_penalty=self.length_penalty, cache_dtype=self.dtype,
            )
            return self.tokenizer.batch_decode(
                np.asarray(toks), skip_special_tokens=True
            )
        if self.server is not None:
            # greedy AND sampled decode both run inside the engine (its
            # decode step samples with per-step PRNG folds); the offline
            # batch drains as ONE device program (run_workload) — no per-
            # token host round-trips
            enc = self.tokenizer(
                prompts, truncation=True, max_length=self.max_length,
                padding=False,
            )
            out = self.server.run_workload(
                enc["input_ids"], max_new_tokens=self.max_new_tokens
            )
            return self.tokenizer.batch_decode(
                out, skip_special_tokens=True
            )
        if self.temperature > 0:
            ii, am = self._tokenize_left_pad(prompts)
            self.seed += 1  # fresh stream per call, reproducible per run
            toks = self._sample(
                self.params, jnp.asarray(ii), jnp.asarray(am),
                jax.random.PRNGKey(self.seed),
                max_new_tokens=self.max_new_tokens,
                eos_token_id=self.tokenizer.eos_token_id,
                pad_token_id=self.tokenizer.pad_token_id,
                temperature=self.temperature, top_p=self.top_p,
                cache_dtype=self.dtype,
            )
            return self.tokenizer.batch_decode(
                np.asarray(toks), skip_special_tokens=True
            )
        ii, am = self._tokenize_left_pad(prompts)
        toks = self._gen(
            self.params,
            input_ids=jnp.asarray(ii),
            attention_mask=jnp.asarray(am),
            max_new_tokens=self.max_new_tokens,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id,
            cache_dtype=self.dtype,
        )
        return self.tokenizer.batch_decode(np.asarray(toks), skip_special_tokens=True)
