"""LLMHandler — the single front-door API.

TPU-native equivalent of the reference's LLMHandler
(reference: src/handlers/llm_handler.{h,cpp}): builds the engine from
Options, owns the scheduler loop thread and request-handling thread pool,
validates sampling params (verify_params, llm_handler.cpp:103-164), applies
chat templates, and keeps tokenization off the scheduler's hot path.
"""

from __future__ import annotations

import logging
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import List, Optional, Sequence

from scalellm_tpu.engine.batch import TOKEN_BUCKETS
from scalellm_tpu.engine.llm_engine import EngineOptions, LLMEngine
from scalellm_tpu.errors import ValidationError
from scalellm_tpu.request.output import (
    Priority,
    RequestOutput,
    Status,
    StatusCode,
)
from scalellm_tpu.request.request import OnOutput, Request
from scalellm_tpu.request.stopping import StoppingCriteria
from scalellm_tpu.sampling.params import SamplingParams
from scalellm_tpu.scheduler.continuous_scheduler import (
    ContinuousScheduler,
    SchedulerOptions,
)
from scalellm_tpu.scheduler.response_handler import ResponseHandler
from scalellm_tpu.utils.chat import Message, apply_chat_template
from scalellm_tpu.utils.metrics import COUNTERS, HISTOGRAMS

logger = logging.getLogger(__name__)


@dataclass
class LLMHandlerOptions:
    """(reference: llm_handler.h:56-102 Options — ~16 knobs)"""

    model_path: str = ""
    devices: str = "auto"
    draft_model_path: Optional[str] = None
    block_size: int = 16
    max_cache_size: int = 0
    max_memory_utilization: float = 0.9
    enable_prefix_cache: bool = True
    enable_cuda_graph: bool = True  # here: warm up jit bucket cache
    max_tokens_per_batch: int = 512
    max_seqs_per_batch: int = 128
    num_speculative_tokens: int = 0
    num_handling_threads: int = 4
    tp_size: int = 1
    sequence_parallel: bool = False  # Megatron SP over the tp axis
    num_blocks: int = 0  # direct override (tests)
    max_context_len: int = 0  # 0 = model's max_position_embeddings
    kv_cache_dtype: str = "auto"  # "auto" | "int8"
    warmup_mode: str = "fast"  # "off" | "fast" | "full" (zero cold compiles)
    # Multi-host pod serving: use DistributedLLMEngine (host-0 driver
    # broadcasts step inputs; see engine/distributed.py).
    distributed: bool = False
    quantize_lm_head: "bool | str" = False  # False | True=int8 | "int4"
    quantize: str = ""  # runtime quant of dense checkpoints: "" | "int4" | "int8"
    # KV swap-out preemption pool bytes (0 = off; memory/kv_swap.py).
    host_swap_bytes: int = 0
    # Async pipelined stepping (scheduler keeps one step in flight).
    enable_async_scheduling: bool = True
    # Decode micro-steps per dispatch (SchedulerOptions.num_decode_steps).
    num_decode_steps: int = 1
    # Multi-LoRA: {adapter name: HF PEFT dir}; requests select by name.
    lora_modules: "Optional[dict]" = None
    # `path=value` ModelArgs overrides (reference: args_overrider.h).
    model_args_overrides: "Optional[list]" = None


class LLMHandler:
    def __init__(self, options: LLMHandlerOptions, mesh=None):
        self.options = options
        engine_opts = EngineOptions(
            model_path=options.model_path,
            block_size=options.block_size,
            max_cache_size=options.max_cache_size,
            max_memory_utilization=options.max_memory_utilization,
            enable_prefix_cache=options.enable_prefix_cache,
            num_blocks=options.num_blocks,
            tp_size=options.tp_size,
            sequence_parallel=options.sequence_parallel,
            warmup=options.enable_cuda_graph,
            warmup_mode=options.warmup_mode,
            max_tokens_per_batch=options.max_tokens_per_batch,
            max_seqs_per_batch=options.max_seqs_per_batch,
            max_context_len=options.max_context_len,
            draft_model_path=options.draft_model_path,
            num_speculative_tokens=options.num_speculative_tokens,
            kv_cache_dtype=options.kv_cache_dtype,
            quantize_lm_head=options.quantize_lm_head,
            quantize=options.quantize,
            host_swap_bytes=options.host_swap_bytes,
            lora_modules=options.lora_modules,
            model_args_overrides=options.model_args_overrides,
            num_decode_steps=options.num_decode_steps,
        )
        if options.lora_modules and (
            options.draft_model_path
            or options.num_speculative_tokens > 0
            or options.distributed
        ):
            raise ValueError(
                "LoRA adapters are not supported with speculative decoding "
                "or multi-host serving"
            )
        if options.draft_model_path:
            from scalellm_tpu.speculative.speculative_engine import SpeculativeEngine

            self.engine = SpeculativeEngine(engine_opts, mesh=mesh)
        elif options.num_speculative_tokens > 0:
            # no draft model: prompt-lookup (n-gram) speculation
            from scalellm_tpu.speculative.ngram import NgramSpeculativeEngine

            self.engine = NgramSpeculativeEngine(engine_opts, mesh=mesh)
        elif options.distributed:
            from scalellm_tpu.engine.distributed import DistributedLLMEngine

            self.engine = DistributedLLMEngine(engine_opts, mesh=mesh)
        else:
            self.engine = LLMEngine(engine_opts, mesh=mesh)
        self.tokenizer = self.engine.tokenizer
        self.model_args = self.engine.model_args

        self._response_handler = ResponseHandler(self.tokenizer, threaded=True)
        self.scheduler = ContinuousScheduler(
            self.engine,
            SchedulerOptions(
                max_tokens_per_batch=options.max_tokens_per_batch,
                max_seqs_per_batch=options.max_seqs_per_batch,
                num_speculative_tokens=options.num_speculative_tokens,
                enable_async_scheduling=options.enable_async_scheduling,
                num_decode_steps=options.num_decode_steps,
            ),
            response_handler=self._response_handler,
        )
        # Request-handling pool keeps tokenization/templating off the
        # scheduler loop (reference: llm_handler.cpp:237-243).
        self._pool = ThreadPoolExecutor(
            max_workers=options.num_handling_threads, thread_name_prefix="handler"
        )
        self._loop_thread: Optional[threading.Thread] = None
        self._stop_event = threading.Event()

        self._max_context_len = options.max_context_len or (
            self.model_args.max_position_embeddings
        )
        # Guided-decoding FSM cache (constrained/): compiled per
        # (constraint, eos-set), shared across requests + handler threads.
        from scalellm_tpu.constrained.guided import FsmCache

        self._fsm_cache = FsmCache()

    # ------------------------------------------------------------- scheduling

    def schedule_async(
        self,
        prompt: str,
        sp: SamplingParams,
        priority: Priority = Priority.NORMAL,
        stream: bool = False,
        callback: OnOutput = lambda out: True,
        lora: Optional[str] = None,
    ) -> None:
        """Validate + tokenize + enqueue, off the caller's thread
        (reference: llm_handler.cpp:286 schedule_async)."""
        self._pool.submit(
            self._handle, prompt, None, sp, priority, stream, callback,
            None, lora,
        )

    def schedule_chat_async(
        self,
        messages: Sequence[Message],
        sp: SamplingParams,
        priority: Priority = Priority.NORMAL,
        stream: bool = False,
        callback: OnOutput = lambda out: True,
        tools=None,
        lora: Optional[str] = None,
    ) -> None:
        """(reference: llm_handler.cpp:266 schedule_chat_async)"""
        self._pool.submit(
            self._handle, None, list(messages), sp, priority, stream, callback,
            tools, lora,
        )

    def schedule_batch_async(
        self,
        prompts: Sequence[str],
        sps: Sequence[SamplingParams],
        priority: Priority = Priority.NORMAL,
        stream: bool = False,
        callbacks: Optional[Sequence[OnOutput]] = None,
    ) -> None:
        assert callbacks is None or len(callbacks) == len(prompts)
        if len(sps) == 1:
            sps = list(sps) * len(prompts)
        for i, (p, sp) in enumerate(zip(prompts, sps)):
            cb = callbacks[i] if callbacks else (lambda out: True)
            self.schedule_async(p, sp, priority, stream, cb)

    def _handle(
        self, prompt, messages, sp, priority, stream, callback, tools=None,
        lora=None,
    ) -> None:
        t0 = time.monotonic()
        try:
            sp.verify()
            if messages is not None:
                prompt = self.apply_chat_template(messages, tools=tools)
            prompt_tokens = self.tokenizer.encode(prompt)
            if not prompt_tokens:
                raise ValidationError(StatusCode.INVALID_ARGUMENT, "empty prompt")
            if len(prompt_tokens) >= self._max_context_len:
                raise ValidationError(
                    StatusCode.INVALID_ARGUMENT,
                    f"prompt ({len(prompt_tokens)} tokens) exceeds max context "
                    f"length {self._max_context_len}",
                )
            if len(prompt_tokens) + sp.max_tokens > TOKEN_BUCKETS[-1]:
                raise ValidationError(
                    StatusCode.INVALID_ARGUMENT,
                    "prompt + max_tokens exceeds engine limit",
                )
            kv_capacity = self.scheduler.max_seq_tokens
            if len(prompt_tokens) + sp.max_tokens > kv_capacity:
                # Would never fit even with every other sequence preempted:
                # fail now rather than park it in the wait queue forever.
                raise ValidationError(
                    StatusCode.RESOURCE_EXHAUSTED,
                    f"prompt + max_tokens ({len(prompt_tokens) + sp.max_tokens}"
                    f" tokens) exceeds KV cache capacity ({kv_capacity})",
                )
            stopping = self._build_stopping_criteria(sp, len(prompt_tokens))
            guided_fsm = None
            if sp.has_guided:
                if self.options.num_speculative_tokens > 0:
                    raise ValidationError(
                        StatusCode.INVALID_ARGUMENT,
                        "guided decoding is not supported with speculative "
                        "decoding (draft proposals bypass the grammar mask)",
                    )
                from scalellm_tpu.constrained.guided import constraint_regex

                regex = constraint_regex(sp)
                eos_ids = tuple(
                    {self.model_args.eos_token_id}
                    | set(self.model_args.stop_token_ids)
                    | set(sp.stop_token_ids or [])
                )
                try:
                    guided_fsm = self._fsm_cache.get(
                        regex, self.tokenizer, eos_ids
                    )
                except ValueError as e:
                    raise ValidationError(
                        StatusCode.INVALID_ARGUMENT,
                        f"invalid guided constraint: {e}",
                    )
            lora_slot = 0
            if lora:
                meta = getattr(self.engine, "lora_meta", None)
                if meta is None or lora not in meta.names:
                    raise ValidationError(
                        StatusCode.INVALID_ARGUMENT,
                        f"unknown LoRA adapter {lora!r}",
                    )
                lora_slot = meta.slot_of(lora)
            request = Request(
                prompt=prompt,
                prompt_tokens=prompt_tokens,
                sampling_params=sp,
                stopping_criteria=stopping,
                on_output=callback,
                stream=stream,
                priority=priority,
                enable_prefix_cache=self.options.enable_prefix_cache,
                guided_fsm=guided_fsm,
                lora_slot=lora_slot,
            )
            if not self.scheduler.schedule(request):
                raise ValidationError(
                    StatusCode.RESOURCE_EXHAUSTED, "request queue is full"
                )
            COUNTERS.inc("request_handling_total")
            HISTOGRAMS.observe(
                "request_handling_latency_seconds", time.monotonic() - t0
            )
        except ValidationError as e:
            callback(
                RequestOutput(
                    status=Status(e.code, e.message),
                    finished=True,
                )
            )
        except Exception as e:  # report, don't kill the pool thread
            logger.exception("request handling failed")
            callback(
                RequestOutput(
                    status=Status(StatusCode.UNKNOWN, str(e)),
                    finished=True,
                )
            )

    def _build_stopping_criteria(
        self, sp: SamplingParams, num_prompt_tokens: int
    ) -> StoppingCriteria:
        max_tokens = sp.max_tokens
        max_ctx = self._max_context_len
        stop_sequences = []
        if sp.stop:
            stop_sequences = [
                self.tokenizer.encode(s, add_special_tokens=False) for s in sp.stop
            ]
        stop_ids = set(sp.stop_token_ids or [])
        stop_ids.update(self.model_args.stop_token_ids)
        return StoppingCriteria(
            max_tokens=max_tokens,
            max_context_len=max_ctx,
            eos_token_id=self.model_args.eos_token_id,
            ignore_eos=sp.ignore_eos,
            stop_token_ids=stop_ids,
            stop_sequences=stop_sequences,
        )

    # ------------------------------------------------------------- templates

    def apply_chat_template(self, messages: Sequence[Message], tools=None) -> str:
        """Jinja template from tokenizer_config when present, else the coded
        per-model template (reference: chat_template.h:20; the reference only
        executes coded templates — jinja is a capability superset)."""
        return apply_chat_template(
            messages,
            jinja_template=getattr(self.tokenizer, "chat_template", None),
            model_type=self.model_args.model_type,
            tools=tools,
        )

    # ------------------------------------------------------------- encode/decode

    def encode(self, text: str) -> List[int]:
        return self.tokenizer.encode(text)

    def decode(self, tokens: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self.tokenizer.decode(tokens, skip_special_tokens)

    # ------------------------------------------------------------- loop

    def start(self) -> None:
        """Start the scheduler loop thread (reference: llm_handler.h:216)."""
        if self._loop_thread is not None:
            return
        self._stop_event.clear()

        def loop():
            while not self._stop_event.is_set():
                try:
                    self.scheduler.step(timeout_s=0.05)
                except Exception:
                    logger.exception("scheduler step failed")
                    time.sleep(0.1)

        self._loop_thread = threading.Thread(target=loop, name="scheduler", daemon=True)
        self._loop_thread.start()

    def stop(self) -> None:
        """Stop the scheduler loop AND release per-instance threads (the
        handling pool + the response-handler worker). Without this every
        discarded handler leaks ~5 daemon threads — measurable in test
        suites and replica-cycling deployments."""
        if self._loop_thread is not None:
            self._stop_event.set()
            self._loop_thread.join(timeout=10)
            self._loop_thread = None
        self._pool.shutdown(wait=False, cancel_futures=True)
        self._response_handler.shutdown()

    def run_until_complete(self) -> None:
        """Drain all scheduled work (offline batch mode,
        reference: llm_handler.cpp:469)."""
        # Wait for handling threads to finish tokenizing/enqueueing first.
        self._pool.shutdown(wait=True)
        self._pool = ThreadPoolExecutor(
            max_workers=self.options.num_handling_threads, thread_name_prefix="handler"
        )
        self.scheduler.run_until_complete()

    def reset(self) -> None:
        pass

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass
