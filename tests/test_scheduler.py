"""Continuous-scheduler tests driven by a fake engine (no device work) —
mirrors the reference's FakeLLMEngine-based scheduler tests
(reference: src/scheduler/scheduler_test.cpp:14,59,111)."""

import numpy as np
import pytest

from scalellm_tpu.engine.batch import Batch
from scalellm_tpu.memory.block_manager import BlockManager, BlockManagerOptions
from scalellm_tpu.request.output import Priority, RequestOutput
from scalellm_tpu.request.request import Request
from scalellm_tpu.request.stopping import StoppingCriteria
from scalellm_tpu.sampling.params import SamplingParams
from scalellm_tpu.scheduler.continuous_scheduler import (
    ContinuousScheduler,
    SchedulerOptions,
)
from scalellm_tpu.scheduler.response_handler import ResponseHandler


class FakeTokenizer:
    """Char-level fake (reference: scheduler_test.cpp:14 FakeTokenizer)."""

    def encode(self, text, add_special_tokens=True):
        return [ord(c) % 256 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(i) for i in ids)

    def id_to_token(self, tid):
        return chr(tid)


class FakeLLMEngine:
    """Appends token (seq_len % 256) for every sampled sequence
    (reference: scheduler_test.cpp:111 FakeLLMEngine)."""

    def __init__(self, num_blocks=64, block_size=4):
        self.tokenizer = FakeTokenizer()
        self.block_manager = BlockManager(
            BlockManagerOptions(num_blocks=num_blocks, block_size=block_size)
        )
        self.batches = []

    def execute_model(self, batch: Batch) -> None:
        self.batches.append(
            [(e.seq.seq_id, e.num_tokens, e.needs_sample) for e in batch.entries]
        )
        next_tokens = []
        for e in batch.entries:
            next_tokens.append(e.seq.num_tokens % 256)
        for e, tok in zip(batch.entries, next_tokens):
            e.seq.commit_kv_cache(e.num_tokens)
            if e.needs_sample:
                e.seq.append_token(tok)


def make_request(prompt="hello", max_tokens=4, on_output=None, priority=Priority.NORMAL, stream=False, n=1, temperature=0.0):
    tok = FakeTokenizer()
    sp = SamplingParams(max_tokens=max_tokens, temperature=temperature, n=n)
    return Request(
        prompt=prompt,
        prompt_tokens=tok.encode(prompt),
        sampling_params=sp,
        stopping_criteria=StoppingCriteria(max_tokens=max_tokens, eos_token_id=-1),
        on_output=on_output or (lambda out: True),
        stream=stream,
        priority=priority,
    )


def make_scheduler(engine=None, **opts):
    engine = engine or FakeLLMEngine()
    sched = ContinuousScheduler(
        engine,
        SchedulerOptions(**opts),
        response_handler=ResponseHandler(engine.tokenizer, threaded=False),
    )
    return engine, sched


def test_generates_until_max_tokens():
    outputs = []
    engine, sched = make_scheduler()
    req = make_request("abc", max_tokens=3, on_output=outputs.append)
    assert sched.schedule(req)
    sched.run_until_complete()
    assert len(outputs) == 1
    out = outputs[0]
    assert out.finished
    assert out.usage.num_prompt_tokens == 3
    assert out.usage.num_generated_tokens == 3
    # fake engine: token = current length % 256 → chr(3), chr(4), chr(5)
    assert out.outputs[0].text == "\x03\x04\x05"


def test_token_budget_chunks_prefill():
    engine, sched = make_scheduler(max_tokens_per_batch=4)
    req = make_request("0123456789", max_tokens=1)
    sched.schedule(req)
    sched.run_until_complete()
    # prefill of 10 tokens is chunked into 4+4+2(+sample)
    sizes = [sum(n for _, n, _ in b) for b in engine.batches]
    assert sizes[0] == 4 and sizes[1] == 4
    # chunks that don't reach the end must not sample
    assert engine.batches[0][0][2] is False
    assert engine.batches[1][0][2] is False


def test_seq_budget_limits_batch():
    engine, sched = make_scheduler(max_seqs_per_batch=2)
    reqs = [make_request("ab", max_tokens=1) for _ in range(5)]
    for r in reqs:
        sched.schedule(r)
    sched.step(timeout_s=0)
    assert len(engine.batches[0]) == 2


def test_priority_order():
    engine, sched = make_scheduler(max_seqs_per_batch=1)
    done_order = []
    low = make_request("aa", max_tokens=1, on_output=lambda o: done_order.append("low") or True, priority=Priority.LOW)
    high = make_request("bb", max_tokens=1, on_output=lambda o: done_order.append("high") or True, priority=Priority.HIGH)
    sched.schedule(low)
    sched.schedule(high)
    sched.run_until_complete()
    assert done_order == ["high", "low"]


def test_preemption_on_block_exhaustion():
    # 8 usable blocks of 4 slots; two requests that each want > half.
    engine, sched = make_scheduler()
    engine2 = FakeLLMEngine(num_blocks=9, block_size=4)
    engine2.block_manager = BlockManager(
        BlockManagerOptions(num_blocks=9, block_size=4, enable_prefix_cache=False)
    )
    engine, sched = make_scheduler(engine2)
    outputs = []
    r1 = make_request("a" * 16, max_tokens=8, on_output=outputs.append)
    r2 = make_request("b" * 16, max_tokens=8, on_output=outputs.append)
    sched.schedule(r1)
    sched.schedule(r2)
    sched.run_until_complete()
    # both must finish despite not fitting concurrently
    assert len(outputs) == 2
    assert all(o.finished for o in outputs)
    assert all(o.usage.num_generated_tokens == 8 for o in outputs)


def test_streaming_deltas():
    chunks = []
    engine, sched = make_scheduler()
    req = make_request("xy", max_tokens=3, on_output=lambda o: chunks.append(o) or True, stream=True)
    sched.schedule(req)
    sched.run_until_complete()
    assert chunks[-1].finished
    text = "".join("".join(s.text for s in c.outputs) for c in chunks)
    assert text == "\x02\x03\x04"


def test_cancel_on_callback_false():
    engine, sched = make_scheduler()
    calls = []

    def cb(out):
        calls.append(out)
        return False  # disconnect after first delta

    req = make_request("xy", max_tokens=50, on_output=cb, stream=True)
    sched.schedule(req)
    sched.run_until_complete()
    # far fewer steps than max_tokens — cancelled early
    assert req.is_cancelled
    assert len(engine.batches) < 50


def test_n_expansion_after_prefill():
    engine, sched = make_scheduler()
    outputs = []
    req = make_request("abcd", max_tokens=2, on_output=outputs.append, n=2)
    sched.schedule(req)
    sched.run_until_complete()
    assert len(outputs) == 1
    assert len(outputs[0].outputs) == 2
    for seq_out in outputs[0].outputs:
        assert len(seq_out.token_ids) == 2


def test_queue_full_returns_false():
    engine, sched = make_scheduler(max_pending_requests=1)
    assert sched.schedule(make_request())
    assert not sched.schedule(make_request())
