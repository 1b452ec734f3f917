"""AsyncLLMEngine + output streams — async serving engine.

API parity with the reference's Python engine
(reference: scalellm/llm_engine.py:12,53,108): OutputStream (sync iterator),
OutputAsyncStream (asyncio iterator fed via call_soon_threadsafe), and
AsyncLLMEngine with schedule_async/schedule_chat_async and start/stop.
"""

from __future__ import annotations

import asyncio
import queue
from typing import List, Optional, Sequence, Union

from scalellm_tpu.errors import ValidationError
from scalellm_tpu.handlers.llm_handler import LLMHandler, LLMHandlerOptions
from scalellm_tpu.request.output import Priority, RequestOutput, StatusCode
from scalellm_tpu.sampling.params import SamplingParams
from scalellm_tpu.utils.chat import Message


class OutputStream:
    """Synchronous stream of RequestOutputs
    (reference: scalellm/llm_engine.py:12)."""

    def __init__(self):
        self._queue: "queue.Queue" = queue.Queue()
        self._cancelled = False

    def put(self, item: RequestOutput) -> bool:
        if self._cancelled:
            return False
        if item.status is not None and not item.status.ok:
            self._queue.put(
                ValidationError(item.status.code, item.status.message)
            )
            return False
        self._queue.put(item)
        if item.finished:
            self._queue.put(None)  # sentinel
        return True

    def cancel(self) -> None:
        self._cancelled = True
        self._queue.put(None)

    def __iter__(self):
        return self

    def __next__(self) -> RequestOutput:
        item = self._queue.get()
        if item is None:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item


class OutputAsyncStream:
    """Asyncio stream of RequestOutputs
    (reference: scalellm/llm_engine.py:53-105)."""

    def __init__(self, loop: asyncio.AbstractEventLoop):
        self._loop = loop
        self._queue: asyncio.Queue = asyncio.Queue()
        self._cancelled = False

    def put(self, item: RequestOutput) -> bool:
        """Called from scheduler/response threads — thread-safe."""
        if self._cancelled:
            return False
        if item.status is not None and not item.status.ok:
            err = ValidationError(item.status.code, item.status.message)
            self._loop.call_soon_threadsafe(self._queue.put_nowait, err)
            return False
        self._loop.call_soon_threadsafe(self._queue.put_nowait, item)
        if item.finished:
            self._loop.call_soon_threadsafe(self._queue.put_nowait, None)
        return True

    def cancel(self) -> None:
        self._cancelled = True
        self._loop.call_soon_threadsafe(self._queue.put_nowait, None)

    def __aiter__(self):
        return self

    async def __anext__(self) -> RequestOutput:
        item = await self._queue.get()
        if item is None:
            raise StopAsyncIteration
        if isinstance(item, Exception):
            raise item
        return item


class AsyncLLMEngine:
    """(reference: scalellm/llm_engine.py:108 AsyncLLMEngine)"""

    def __init__(
        self,
        model: str,
        block_size: int = 16,
        max_cache_size: int = 0,
        max_memory_utilization: float = 0.9,
        enable_prefix_cache: bool = True,
        enable_cuda_graph: bool = True,
        max_tokens_per_batch: int = 512,
        max_seqs_per_batch: int = 128,
        num_speculative_tokens: int = 0,
        num_handling_threads: int = 4,
        draft_model: Optional[str] = None,
        tp_size: int = 1,
        sequence_parallel: bool = False,
        num_blocks: int = 0,
        kv_cache_dtype: str = "auto",
        quantize: str = "",
        warmup_mode: str = "fast",
        model_args_overrides=None,
        distributed: bool = False,
        enable_async_scheduling: bool = True,
        num_decode_steps: int = 1,
        lora_modules=None,
        mesh=None,
    ) -> None:
        options = LLMHandlerOptions(
            model_path=model,
            draft_model_path=draft_model,
            block_size=block_size,
            max_cache_size=max_cache_size,
            max_memory_utilization=max_memory_utilization,
            enable_prefix_cache=enable_prefix_cache,
            enable_cuda_graph=enable_cuda_graph,
            max_tokens_per_batch=max_tokens_per_batch,
            max_seqs_per_batch=max_seqs_per_batch,
            num_speculative_tokens=num_speculative_tokens,
            num_handling_threads=num_handling_threads,
            tp_size=tp_size,
            sequence_parallel=sequence_parallel,
            num_blocks=num_blocks,
            kv_cache_dtype=kv_cache_dtype,
            quantize=quantize,
            warmup_mode=warmup_mode,
            model_args_overrides=model_args_overrides,
            distributed=distributed,
            enable_async_scheduling=enable_async_scheduling,
            num_decode_steps=num_decode_steps,
            lora_modules=lora_modules,
        )
        self._handler = LLMHandler(options, mesh=mesh)

    # ------------------------------------------------------------- scheduling

    async def schedule_async(
        self,
        prompt: str,
        sampling_params: Optional[SamplingParams] = None,
        priority: Priority = Priority.NORMAL,
        stream: bool = False,
        lora: Optional[str] = None,
    ) -> OutputAsyncStream:
        sp = sampling_params or SamplingParams()
        out_stream = OutputAsyncStream(asyncio.get_running_loop())
        self._handler.schedule_async(
            prompt, sp, priority, stream, out_stream.put, lora=lora
        )
        return out_stream

    @property
    def lora_names(self) -> List[str]:
        meta = getattr(self._handler.engine, "lora_meta", None)
        return list(meta.names) if meta is not None else []

    async def schedule_chat_async(
        self,
        messages: Sequence[Message],
        sampling_params: Optional[SamplingParams] = None,
        priority: Priority = Priority.NORMAL,
        stream: bool = False,
        tools=None,
        lora: Optional[str] = None,
    ) -> OutputAsyncStream:
        sp = sampling_params or SamplingParams()
        out_stream = OutputAsyncStream(asyncio.get_running_loop())
        self._handler.schedule_chat_async(
            messages, sp, priority, stream, out_stream.put, tools=tools,
            lora=lora,
        )
        return out_stream

    def schedule(
        self,
        prompt: str,
        sampling_params: Optional[SamplingParams] = None,
        priority: Priority = Priority.NORMAL,
        stream: bool = False,
    ) -> OutputStream:
        sp = sampling_params or SamplingParams()
        out_stream = OutputStream()
        self._handler.schedule_async(prompt, sp, priority, stream, out_stream.put)
        return out_stream

    def schedule_chat(
        self,
        messages: Sequence[Message],
        sampling_params: Optional[SamplingParams] = None,
        priority: Priority = Priority.NORMAL,
        stream: bool = False,
        tools=None,
    ) -> OutputStream:
        sp = sampling_params or SamplingParams()
        out_stream = OutputStream()
        self._handler.schedule_chat_async(
            messages, sp, priority, stream, out_stream.put, tools=tools
        )
        return out_stream

    # ------------------------------------------------------------- lifecycle

    def start(self) -> None:
        self._handler.start()

    def stop(self) -> None:
        self._handler.stop()

    def apply_chat_template(self, messages: Sequence[Message]) -> Optional[str]:
        return self._handler.apply_chat_template(messages)

    def encode(self, text: str) -> List[int]:
        return self._handler.encode(text)

    def decode(self, tokens: Sequence[int]) -> str:
        return self._handler.decode(tokens)

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False
