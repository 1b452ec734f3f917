"""scalellm_tpu — a TPU-native LLM inference engine.

A from-scratch JAX/XLA/Pallas serving framework with the capabilities of the
ScaleLLM reference engine (see SURVEY.md): continuous batching, paged KV cache
with prefix caching, chunked prefill, tensor parallelism over device meshes,
weight-only quantization, speculative decoding, and an OpenAI-compatible
server.

Public API (mirrors the reference's Python surface, scalellm/__init__.py):
  - LLM: synchronous offline batch inference
  - AsyncLLMEngine: async serving engine
  - SamplingParams, Message, Priority, RequestOutput, ...
"""

from scalellm_tpu.version import __version__

from scalellm_tpu.request.output import (
    FinishReason,
    LogProb,
    LogProbData,
    Priority,
    RequestOutput,
    SequenceOutput,
    Status,
    StatusCode,
    Usage,
)
from scalellm_tpu.sampling.params import SamplingParams
from scalellm_tpu.utils.chat import Message
from scalellm_tpu.errors import ValidationError


def __getattr__(name):
    # Lazy imports: keep `import scalellm_tpu` light (no jax import) so that
    # pure-python components (scheduler/memory/request tests) stay fast.
    if name == "LLM":
        from scalellm_tpu.llm import LLM

        return LLM
    if name == "AsyncLLMEngine":
        from scalellm_tpu.llm_engine import AsyncLLMEngine

        return AsyncLLMEngine
    if name == "OutputStream":
        from scalellm_tpu.llm_engine import OutputStream

        return OutputStream
    if name == "OutputAsyncStream":
        from scalellm_tpu.llm_engine import OutputAsyncStream

        return OutputAsyncStream
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "__version__",
    "LLM",
    "AsyncLLMEngine",
    "OutputStream",
    "OutputAsyncStream",
    "SamplingParams",
    "Message",
    "Priority",
    "RequestOutput",
    "SequenceOutput",
    "Status",
    "StatusCode",
    "Usage",
    "LogProb",
    "LogProbData",
    "FinishReason",
    "ValidationError",
]
