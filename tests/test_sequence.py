"""Sequence / stopping / request tests (intent mirrors reference
sequence_test.cpp, stopping_criteria semantics)."""

from scalellm_tpu.request.output import FinishReason
from scalellm_tpu.request.request import Request
from scalellm_tpu.request.sequence import EngineType, Sequence
from scalellm_tpu.request.stopping import StoppingCriteria
from scalellm_tpu.sampling.params import SamplingParams


class FakeTokenizer:
    """Trivially invertible tokenizer for tests (reference: scheduler_test.cpp:14)."""

    def encode(self, text):
        return [ord(c) for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(i) for i in ids)


def make_seq(prompt_ids, max_tokens=16, **sp_kwargs):
    sp = SamplingParams(max_tokens=max_tokens, **sp_kwargs)
    sc = StoppingCriteria(max_tokens=max_tokens, eos_token_id=2)
    return Sequence(0, prompt_ids, sp, sc, prompt="")


class TestStoppingCriteria:
    def test_max_tokens(self):
        sc = StoppingCriteria(max_tokens=2, eos_token_id=-1)
        assert sc.check_finished([1, 2, 3], 2)[0] == FinishReason.NONE
        assert sc.check_finished([1, 2, 3, 4], 2)[0] == FinishReason.LENGTH

    def test_eos(self):
        sc = StoppingCriteria(max_tokens=10, eos_token_id=2)
        reason, hide = sc.check_finished([5, 6, 2], 2)
        assert reason == FinishReason.STOP and hide == 1

    def test_ignore_eos(self):
        sc = StoppingCriteria(max_tokens=10, eos_token_id=2, ignore_eos=True)
        assert sc.check_finished([5, 6, 2], 2)[0] == FinishReason.NONE

    def test_stop_sequence(self):
        sc = StoppingCriteria(max_tokens=10, stop_sequences=[[7, 8]])
        assert sc.check_finished([1, 7], 1)[0] == FinishReason.NONE
        reason, hide = sc.check_finished([1, 7, 8], 1)
        assert reason == FinishReason.STOP and hide == 2

    def test_max_context_len(self):
        sc = StoppingCriteria(max_tokens=100, max_context_len=4)
        assert sc.check_finished([1, 2, 3, 9], 3)[0] == FinishReason.LENGTH


class TestSequence:
    def test_append_and_counts(self):
        seq = make_seq([1, 5, 5])
        assert seq.num_prompt_tokens == 3
        seq.append_token(5)
        seq.append_token(9)
        assert seq.num_generated_tokens == 2
        assert seq.token_counts[5] == 3
        assert seq.token_counts[9] == 1

    def test_kv_counters_per_engine(self):
        seq = make_seq([1, 2, 3, 4])
        # pretend 2 blocks of 4 allocated
        from scalellm_tpu.memory.block_allocator import BlockAllocator

        alloc = BlockAllocator(8, 4)
        seq.append_blocks(alloc.allocate_many(2))
        seq.engine_type = EngineType.LLM
        seq.commit_kv_cache(4)
        assert seq.num_kv_cache_tokens(EngineType.LLM) == 4
        assert seq.num_kv_cache_tokens(EngineType.SSM) == 0

    def test_validate_tokens_accept_all(self):
        # speculative: 3 draft tokens in the tail, all accepted + bonus
        seq = make_seq([1, 2, 3], max_tokens=20)
        from scalellm_tpu.memory.block_allocator import BlockAllocator

        alloc = BlockAllocator(8, 4)
        seq.append_blocks(alloc.allocate_many(2))
        for t in (10, 11, 12):  # draft tokens appended during spec loop
            seq.append_token(t)
        seq.commit_kv_cache(6)  # kv for all but none of bonus
        n = seq.validate_tokens([10, 11, 12, 13])  # all accepted + bonus 13
        assert n == 4
        assert seq.token_ids == [1, 2, 3, 10, 11, 12, 13]
        assert seq.num_kv_cache_tokens() == 6  # rewound to len-1

    def test_validate_tokens_reject_suffix(self):
        seq = make_seq([1, 2, 3], max_tokens=20)
        for t in (10, 11, 12):
            seq.append_token(t)
        seq.commit_kv_cache(0)
        n = seq.validate_tokens([10, 77, -1, -1])  # second draft rejected->77
        assert n == 2
        assert seq.token_ids == [1, 2, 3, 10, 77]
        # counts updated correctly
        assert 11 not in seq.token_counts and 12 not in seq.token_counts
        assert seq.token_counts[77] == 1


class TestIncrementalDecode:
    def test_streaming_delta(self):
        tok = FakeTokenizer()
        seq = make_seq(tok.encode("hi"), max_tokens=10)
        seq.append_token(ord("a"))
        out = seq.build_delta_output(tok)
        assert out.text == "a"
        seq.append_token(ord("b"))
        out = seq.build_delta_output(tok)
        assert out.text == "b"

    def test_echo_includes_prompt(self):
        tok = FakeTokenizer()
        sp = SamplingParams(max_tokens=10, echo=True)
        sc = StoppingCriteria(max_tokens=10)
        seq = Sequence(0, tok.encode("hi"), sp, sc, prompt="hi", echo=True)
        seq.append_token(ord("!"))
        out = seq.build_delta_output(tok)
        assert out.text == "hi!"


class TestRequest:
    def test_lazy_expansion(self):
        sp = SamplingParams(max_tokens=5, n=2, best_of=3)
        req = Request(
            prompt="x",
            prompt_tokens=[1, 2],
            sampling_params=sp,
            stopping_criteria=StoppingCriteria(max_tokens=5),
            on_output=lambda o: True,
        )
        assert len(req.sequences) == 1
        assert not req.should_expand_sequences()
        req.sequences[0].commit_kv_cache(0)  # no-op, no blocks
        # simulate prefill done
        from scalellm_tpu.memory.block_allocator import BlockAllocator

        alloc = BlockAllocator(8, 4)
        req.sequences[0].append_blocks(alloc.allocate_many(1))
        req.sequences[0].commit_kv_cache(2)
        assert req.should_expand_sequences()
        req.expand_sequences()
        assert len(req.sequences) == 3

    def test_finished_and_output(self):
        tok = FakeTokenizer()
        sp = SamplingParams(max_tokens=2, n=1)
        req = Request(
            prompt="ab",
            prompt_tokens=tok.encode("ab"),
            sampling_params=sp,
            stopping_criteria=StoppingCriteria(max_tokens=2),
            on_output=lambda o: True,
        )
        seq = req.sequences[0]
        seq.append_token(ord("c"))
        assert not req.is_finished()
        seq.append_token(ord("d"))
        assert req.is_finished()
        out = req.build_output(tok)
        assert out.finished
        assert out.outputs[0].text == "cd"
        assert out.outputs[0].finish_reason == FinishReason.LENGTH
        assert out.usage.num_generated_tokens == 2
