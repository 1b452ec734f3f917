"""Serving soak test with cancellation fuzzing (SURVEY §5 failure handling).

Drives the full handler (scheduler loop thread + request pool + async
pipelined steps) in-process with a randomized mix of stream/non-stream
requests, mid-stream cancellations, and varied lengths/params, then checks
the engine landed in a clean terminal state: every request completed or was
cancelled, no pending requests, every KV block free, and the block
manager's accounting is intact. Deterministic seed keeps failures
reproducible."""

import random
import threading
import time

import pytest

import tests.fixtures as fixtures
from scalellm_tpu.handlers.llm_handler import LLMHandler, LLMHandlerOptions
from scalellm_tpu.sampling.params import SamplingParams

SEED = 20260818
N_REQUESTS = 60
SOAK_TIMEOUT_S = 300


@pytest.fixture(scope="module")
def handler(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_soak"))
    fixtures.make_tiny_llama(d, tokenizer=True)
    h = LLMHandler(
        LLMHandlerOptions(
            model_path=d,
            block_size=4,
            num_blocks=160,  # small pool: forces preemption under load
            enable_cuda_graph=False,
            max_tokens_per_batch=128,
            max_seqs_per_batch=16,
            num_handling_threads=4,
        )
    )
    h.start()
    yield h
    h.stop()


class _Client:
    """One fuzzed request: records outputs; may cancel mid-stream by
    returning False from the callback (reference: response_handler.cpp:90)."""

    def __init__(self, rng):
        self.stream = rng.random() < 0.6
        self.cancel_after = (
            rng.randint(1, 4) if self.stream and rng.random() < 0.35 else None
        )
        self.max_tokens = rng.randint(1, 24)
        self.prompt = "soak " * rng.randint(1, 30)
        self.temperature = rng.choice([0.0, 0.0, 0.8])
        self.rep_penalty = rng.choice([1.0, 1.0, 1.0, 1.2])  # sync fallback mix
        self.logprobs = rng.random() < 0.2
        self.done = threading.Event()
        self.error = None
        self.finish_reasons = []
        self.deliveries = 0
        self.cancelled = False

    def sampling_params(self):
        return SamplingParams(
            max_tokens=self.max_tokens,
            temperature=self.temperature,
            repetition_penalty=self.rep_penalty,
            logprobs=self.logprobs,
            top_logprobs=2 if self.logprobs else 0,
            ignore_eos=True,
        )

    def callback(self, out) -> bool:
        if out.status is not None and not out.status.ok:
            if not self.cancelled:  # terminal CANCELLED status is expected
                self.error = out.status.message or out.status.code
            self.done.set()
            return True
        self.deliveries += 1
        if out.finished:
            for so in out.outputs:
                self.finish_reasons.append(so.finish_reason)
            self.done.set()
            return True
        if self.cancel_after is not None and self.deliveries >= self.cancel_after:
            self.cancelled = True
            self.done.set()  # no further delivery is guaranteed after cancel
            return False
        return True


def test_soak_with_cancellation(handler):
    rng = random.Random(SEED)
    clients = [_Client(rng) for _ in range(N_REQUESTS)]
    for i, c in enumerate(clients):
        handler.schedule_async(
            c.prompt,
            c.sampling_params(),
            stream=c.stream,
            callback=c.callback,
        )
        if i % 7 == 0:
            time.sleep(0.02)  # stagger arrivals so batches vary in shape

    deadline = time.time() + SOAK_TIMEOUT_S
    for c in clients:
        remaining = max(deadline - time.time(), 0.1)
        assert c.done.wait(remaining), "request neither finished nor cancelled"

    # Drain: cancelled requests take a step or two to retire fully.
    sched = handler.scheduler
    deadline = time.time() + 60
    while time.time() < deadline:
        if (
            sched.num_pending_requests == 0
            and not sched._requests
            and sched._inflight is None
        ):
            break
        time.sleep(0.1)

    assert sched.num_pending_requests == 0
    assert not sched._requests
    assert sched._inflight is None

    # every block returned to the pool (minus the reserved padding block)
    bm = handler.engine.block_manager
    total = bm.max_seq_tokens // bm.block_size
    assert bm.num_free_blocks + bm.num_blocks_in_prefix_cache == total, (
        bm.num_free_blocks,
        bm.num_blocks_in_prefix_cache,
        total,
    )

    finished = [c for c in clients if not c.cancelled]
    assert all(c.error is None for c in clients), [c.error for c in clients]
    assert all(c.finish_reasons for c in finished)


def test_soak_burst_identical_prompts(handler):
    """Prefix-cache-heavy burst: identical prompts land together, share
    blocks, and all finish."""
    clients = []
    for _ in range(20):
        c = _Client(random.Random(1))
        c.cancel_after = None
        clients.append(c)
        handler.schedule_async(
            "burst prompt shared by everyone",
            SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True),
            stream=False,
            callback=c.callback,
        )
    for c in clients:
        assert c.done.wait(120)
    assert all(c.error is None for c in clients)
