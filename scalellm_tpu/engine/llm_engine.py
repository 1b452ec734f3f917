"""LLMEngine — owns the model executor, tokenizer, and KV block manager.

TPU-native equivalent of the reference's LLMEngine
(reference: src/engine/llm_engine.{h,cpp}). Init pipeline mirrors
llm_engine.cpp:110: load model → profile device memory → size the KV cache →
allocate blocks → warm up compiled buckets (the CUDA-graph-capture analog).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from scalellm_tpu.engine.batch import Batch
from scalellm_tpu.engine.executor import Executor
from scalellm_tpu.memory.block_manager import BlockManagerOptions
from scalellm_tpu.model_loader.loader import HFModelLoader
from scalellm_tpu.models.registry import ModelRegistry
from scalellm_tpu.parallel.config import ParallelConfig
from scalellm_tpu.tokenizer.tokenizer import load_tokenizer

logger = logging.getLogger(__name__)


def _merge_pending_tokens(host_tokens, prev_next_tokens, gather_idx, mask):
    """Device-side token feedback for async pipelining: rows flagged in
    `mask` take their value from the previous step's sampled outputs (still
    on device) instead of the host-prepared array — no host fetch on the
    critical path. Tiny jit; caches per (T, S_prev) bucket pair."""
    import jax
    import jax.numpy as jnp

    global _merge_jit
    if _merge_jit is None:
        _merge_jit = jax.jit(
            lambda host, prev, idx, m: jnp.where(m, prev[idx], host)
        )
    return _merge_jit(host_tokens, prev_next_tokens, gather_idx, mask)


_merge_jit = None


@dataclass
class EngineOptions:
    """Engine knobs (reference: llm_handler.h:56-102 Options)."""

    model_path: str = ""
    block_size: int = 16
    # Max KV cache size in bytes (0 = use memory utilization instead).
    max_cache_size: int = 0
    # Fraction of free device memory for KV (reference default 0.9).
    max_memory_utilization: float = 0.9
    enable_prefix_cache: bool = True
    # Direct override for number of KV blocks (tests / CPU).
    num_blocks: int = 0
    # Tensor-parallel degree (devices per replica).
    tp_size: int = 1
    # Megatron-style sequence parallelism over the tp axis (dense models,
    # no LoRA): norms/residuals run on a T/tp token shard; AR becomes
    # AG + RS (same bytes) and the elementwise HBM traffic drops tp-fold.
    sequence_parallel: bool = False
    # Warm up compile cache at init. warmup_mode "fast" = 2 buckets,
    # "full" = every bucket reachable under the serving envelope (zero
    # mid-serve compiles; pair with the persistent compile cache).
    warmup: bool = True
    warmup_mode: str = "fast"
    # Serving envelope used by full warmup (and scheduler mirrors).
    max_tokens_per_batch: int = 512
    max_seqs_per_batch: int = 128
    max_context_len: int = 4096
    max_top_logprobs: int = 20
    # Speculative decoding.
    draft_model_path: Optional[str] = None
    num_speculative_tokens: int = 0
    # Multi-step decode horizon (warms the N-step program when > 1).
    num_decode_steps: int = 1
    # KV cache quantization: "auto" | "int8"
    kv_cache_dtype: str = "auto"
    # Runtime int8/int4 quantization of the lm_head for quantized models
    # (False | True=int8 | "int4").
    quantize_lm_head: "bool | str" = False
    # Runtime weight quantization of DENSE checkpoints: "" | "int4" | "int8"
    # (serving-time quantization — the reference only loads pre-quantized
    # GPTQ/AWQ checkpoints; see quantization/runtime.py).
    quantize: str = ""
    # Persistent XLA compilation cache dir ("" = env SCALELLM_COMPILE_CACHE
    # or disabled). Buckets compile once ever, not once per process — warm
    # restarts skip all jit compiles.
    compilation_cache_dir: str = ""
    # KV swap-out preemption: stage preempted sequences' KV pages in host
    # memory and restore on reschedule instead of re-prefilling (the
    # reference only drops + recomputes). 0 disables; otherwise the host
    # staging-pool byte budget.
    host_swap_bytes: int = 0
    # Multi-LoRA serving: {adapter name: HF PEFT adapter dir}. Requests pick
    # an adapter by name (REST: the `model` field); tp_size must be 1.
    lora_modules: "Optional[dict]" = None
    # `path=value` overrides applied to the loaded ModelArgs (dotted paths
    # reach QuantArgs etc: "quant_args.bits=8", "rope_theta=1e6").
    # Reference parity: src/model_loader/args_overrider.h; shown on /config.
    model_args_overrides: "Optional[list]" = None


class LLMEngine:
    """(reference: src/engine/engine.h:10 Engine interface)

    extra_kv_slot_bytes / shared_block_manager support SpeculativeEngine
    composition: the target engine's memory profile reserves room for the
    draft's KV (reference: speculative_engine.cpp:140-159 shared-device KV
    split), and the draft engine reuses the target's BlockManager so slot
    ids map 1:1 across both caches.
    """

    def __init__(
        self,
        options: EngineOptions,
        mesh=None,
        extra_kv_slot_bytes: int = 0,
        shared_block_manager=None,
    ):
        self.options = options
        self.mesh = mesh
        self._extra_kv_slot_bytes = extra_kv_slot_bytes
        t0 = time.monotonic()
        import os

        if options.compilation_cache_dir:
            os.environ["SCALELLM_COMPILE_CACHE"] = options.compilation_cache_dir
        from scalellm_tpu.utils.compile_cache import enable_compilation_cache

        # Default ON (~/.cache/scalellm_tpu/jax): warmup compiles persist
        # across restarts — measured tens of minutes of 8B serving-envelope
        # compiles drop to seconds on a warm restart.
        enable_compilation_cache()

        # ---- load model metadata (reference: llm_engine.cpp:133 init_model)
        loader = HFModelLoader(options.model_path)
        self.model_args = loader.model_args
        self.quant_args = loader.quant_args
        self.tokenizer_args = loader.tokenizer_args
        self.tokenizer = load_tokenizer(
            options.model_path, loader.tokenizer_args.chat_template
        )

        if options.kv_cache_dtype != "auto":
            self.model_args.kv_cache_dtype = options.kv_cache_dtype
        if options.quantize_lm_head and self.model_args.quant_args:
            self.model_args.quant_args.quantize_lm_head = True
        # Ops-facing model-args overrides (reference: args_overrider.h);
        # applied AFTER the checkpoint's config so the flag wins.
        from scalellm_tpu.utils.args_override import apply_overrides

        self.applied_model_args_overrides = apply_overrides(
            self.model_args, options.model_args_overrides or []
        )
        tp = options.tp_size
        if mesh is not None:
            tp = int(mesh.shape.get("tp", tp))
        parallel = ParallelConfig(
            tp_axis="tp" if (mesh is not None and tp > 1) else None,
            tp_size=tp if mesh is not None else 1,
            sp=options.sequence_parallel,
        )
        factory = ModelRegistry.get_causal_lm_factory(self.model_args.model_type)
        if factory is None:
            raise ValueError(f"no causal LM for {self.model_args.model_type!r}")
        self.model = factory(self.model_args, parallel)

        params = loader.load_params(self.model)
        if options.quantize and not (
            self.model_args.quant_args and self.model_args.quant_args.enabled
        ):
            from scalellm_tpu.config import QuantArgs
            from scalellm_tpu.quantization.runtime import quantize_model_params

            qargs = QuantArgs(
                quant_method="internal",
                bits=4 if options.quantize == "int4" else 8,
                group_size=128,
                quantize_lm_head=options.quantize_lm_head,
            )
            self.model, params = quantize_model_params(self.model, params, qargs)
            self.model_args = self.model.args
            self.quant_args = qargs
            logger.info("runtime-quantized dense checkpoint to %s", options.quantize)
        self.lora_meta = None
        if options.lora_modules:
            from scalellm_tpu.lora import load_lora_adapters

            if self.model_args.n_experts > 0:
                raise ValueError("LoRA on MoE models is not supported")
            if not hasattr(self.model, "lora_meta"):
                raise ValueError(
                    f"model family {self.model_args.model_type!r} does not "
                    "support LoRA adapters"
                )
            lora_layers, self.lora_meta = load_lora_adapters(
                options.lora_modules, self.model
            )
            params["layers"].update(lora_layers)
            self.model.lora_meta = self.lora_meta
            logger.info(
                "loaded %d LoRA adapter(s): %s",
                len(self.lora_meta.names), self.lora_meta.names,
            )
        self.executor = Executor(
            self.model,
            params,
            mesh=mesh,
            max_top_logprobs=options.max_top_logprobs,
        )
        del params
        logger.info(
            "model %s loaded in %.1fs", self.model_args.model_type, time.monotonic() - t0
        )

        # ---- size + allocate KV cache
        if shared_block_manager is not None:
            num_blocks = shared_block_manager.options.num_blocks
            self.block_manager = shared_block_manager
        else:
            from scalellm_tpu.memory.native_block_manager import (
                create_block_manager,
            )

            num_blocks = options.num_blocks or self._profile_num_blocks()
            self.block_manager = create_block_manager(
                BlockManagerOptions(
                    num_blocks=num_blocks,
                    block_size=options.block_size,
                    enable_prefix_cache=options.enable_prefix_cache,
                )
            )
        self.executor.init_kv_cache(num_blocks, options.block_size)

        # KV swap-out preemption (memory/kv_swap.py). Driver-local staging:
        # disabled on multi-host meshes where followers' caches must stay
        # in lockstep with the driver's jitted steps.
        self.kv_swapper = None
        if options.host_swap_bytes > 0:
            import jax as _jax

            if _jax.process_count() == 1:
                from scalellm_tpu.memory.kv_swap import HostKVPool, KVSwapper

                self.kv_swapper = KVSwapper(
                    self.executor,
                    self.block_manager,
                    options.block_size,
                    HostKVPool(options.host_swap_bytes),
                )
            else:
                logger.warning("kv swap disabled on multi-host meshes")
        logger.info(
            "kv cache: %d blocks x %d slots (%.2f GiB)",
            num_blocks,
            options.block_size,
            self.executor.kv_cache_hbm_bytes(num_blocks, options.block_size) / 2**30,
        )

        if options.warmup:
            self.executor.warmup(
                options.block_size,
                mode=options.warmup_mode,
                max_tokens=options.max_tokens_per_batch,
                max_seqs=options.max_seqs_per_batch,
                max_context_len=options.max_context_len
                or self.model_args.max_position_embeddings,
                multi_steps=options.num_decode_steps,
            )

        self._step_counter = 0

    # ---------------------------------------------------------------- memory

    def kv_cache_slot_size_in_bytes(self) -> int:
        """Bytes per KV slot across all layers
        (reference: llm_engine.cpp:378 kv_cache_slot_size_in_bytes)."""
        a = self.model_args
        dtype_size = (
            1
            if a.kv_cache_dtype == "int8"
            else {"bfloat16": 2, "float16": 2, "float32": 4}[a.dtype]
        )
        # Derive from the model's own page layout (covers head packing /
        # padding and deepseek's single-latent-head cache uniformly).
        shape = self.model.kv_cache_shape(1, 1)  # [L, 1, 1, 2*Hkv, Dh]
        return shape[0] * shape[-2] * shape[-1] * dtype_size

    def _profile_num_blocks(self) -> int:
        """Profile available device memory and size the KV cache
        (reference: llm_engine.cpp:235 profile_memory_for_kv_cache)."""
        import jax

        opts = self.options
        slot_bytes = self.kv_cache_slot_size_in_bytes() + self._extra_kv_slot_bytes
        block_bytes = slot_bytes * opts.block_size

        if opts.max_cache_size > 0:
            cache_bytes = opts.max_cache_size
        else:
            dev = jax.devices()[0]
            stats = None
            try:
                stats = dev.memory_stats()
            except Exception:
                pass
            if stats and stats.get("bytes_limit"):
                limit = stats["bytes_limit"]
                in_use = stats.get("bytes_in_use", 0)
                free = limit - in_use
                cache_bytes = int(free * opts.max_memory_utilization)
            else:
                # CPU / simulator: modest default.
                cache_bytes = 256 * 2**20
        num_blocks = max(cache_bytes // block_bytes, 16)
        # TP shards the kv-head dim across devices; per-device blocks hold
        # n_kv/tp heads, so the device budget supports tp× the blocks — but
        # the logical block count is global, so no adjustment needed (each
        # device stores 1/tp of every block).
        return int(num_blocks)

    # -------------------------------------------------------- multi-step

    @property
    def supports_multi_step(self) -> bool:
        """Multi-step decode (N micro-steps per dispatch) needs device-side
        token feedback — single-process drivers only, like async."""
        return not getattr(self.executor, "_multiprocess", False)

    def execute_model_multi(self, batch: Batch, num_steps: int) -> None:
        """Run `num_steps` decode micro-steps in ONE dispatch (device-side
        lax.scan with in-graph token feedback): one host round trip and one
        batch prep per N tokens. The scheduler reserves N KV slots per
        sequence and gates on Batch.can_multi_step; tokens sampled after a
        sequence finishes mid-window are discarded host-side (their KV
        writes land in the sequence's own reserved slots or the padding
        page — see Executor._build_multi_step_fn)."""
        self._step_counter += 1
        mi, si, _ = batch.prepare_model_inputs(
            self.options.block_size, self._step_counter
        )
        if self.lora_meta is not None:
            mi.lora_ids = batch.lora_slots
        outs = self.executor.execute_multi(
            mi, si, num_steps, self.options.block_size
        )
        next_tokens = np.asarray(outs.next_tokens)  # [N, S]
        want_lp = any(e.seq.sampling_params.logprobs for e in batch.entries)
        logprobs = np.asarray(outs.logprobs) if want_lp else None
        top_ids = np.asarray(outs.top_ids) if want_lp else None
        top_lps = np.asarray(outs.top_logprobs) if want_lp else None
        batch.process_multi_sample_output(
            next_tokens, logprobs, top_ids, top_lps, self.tokenizer
        )

    # ------------------------------------------------------------- async step

    @property
    def supports_async(self) -> bool:
        """Async pipelined stepping (dispatch_model/finalize_model) works
        when one host drives the program: device-side token feedback can't
        cross the multi-process broadcast (engine/distributed.py wraps this
        engine and doesn't expose dispatch_model)."""
        return not getattr(self.executor, "_multiprocess", False)

    def dispatch_model(self, batch: Batch, prev_outs=None):
        """Dispatch one step WITHOUT fetching its results. Sampled tokens are
        appended as pending placeholders (Sequence.append_pending_token);
        rows whose input token is still on device (previous step's sample)
        are merged in-graph from `prev_outs.next_tokens`. Pair with
        finalize_model once the NEXT step has been dispatched."""
        self._step_counter += 1
        mi, si, _ = batch.prepare_model_inputs(
            self.options.block_size, self._step_counter
        )
        if self.lora_meta is not None:
            mi.lora_ids = batch.lora_slots
        if batch.pending_fix is not None:
            mask, gather = batch.pending_fix
            mi.token_ids = _merge_pending_tokens(
                mi.token_ids, prev_outs.next_tokens, gather, mask
            )
        outs = self.executor.execute(mi, si, decode_only=batch.is_decode_only)
        batch.append_pending_tokens()
        return outs

    def finalize_model(self, batch: Batch, outs) -> None:
        """Fetch a dispatched step's samples and resolve its pending tokens."""
        next_tokens = np.asarray(outs.next_tokens)
        want_lp = any(e.seq.sampling_params.logprobs for e in batch.entries)
        logprobs = np.asarray(outs.logprobs) if want_lp else None
        top_ids = np.asarray(outs.top_ids) if want_lp else None
        top_lps = np.asarray(outs.top_logprobs) if want_lp else None
        batch.resolve_sample_output(
            next_tokens, logprobs, top_ids, top_lps, self.tokenizer
        )

    # ---------------------------------------------------------------- execute

    def execute_model(self, batch: Batch) -> None:
        """Run one engine step for the batch
        (reference: llm_engine.cpp:342 execute_model)."""
        if not batch.entries:
            return
        self._step_counter += 1
        mi, si, needs_sample = batch.prepare_model_inputs(
            self.options.block_size, self._step_counter
        )
        if self.lora_meta is not None:
            mi.lora_ids = batch.lora_slots
        if batch.score_top_k is not None:
            outs, scores = self.executor.execute(
                mi, si,
                score_targets=batch.score_targets,
                score_top_k=batch.score_top_k,
            )
            batch.process_prompt_scores(
                np.asarray(scores[0]),
                np.asarray(scores[1]),
                np.asarray(scores[2]),
                self.tokenizer,
            )
        else:
            outs = self.executor.execute(
                mi, si, decode_only=batch.is_decode_only
            )
        next_tokens = np.asarray(outs.next_tokens)
        want_lp = any(
            e.seq.sampling_params.logprobs for e in batch.entries
        )
        logprobs = np.asarray(outs.logprobs) if want_lp else None
        top_ids = np.asarray(outs.top_ids) if want_lp else None
        top_lps = np.asarray(outs.top_logprobs) if want_lp else None
        batch.process_sample_output(
            next_tokens, logprobs, top_ids, top_lps, self.tokenizer
        )
