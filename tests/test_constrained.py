"""Constrained (guided) decoding: FSM unit tests + end-to-end generation.

Capability extension beyond the reference engine. E2E runs on the tiny
char-tokenizer llama fixture: whatever the model wants to say, the mask
must force output into the constraint language.
"""

import json

import numpy as np
import pytest

import tests.fixtures as fixtures
from scalellm_tpu.constrained.fsm import DEAD, START, compile_regex
from scalellm_tpu.constrained.json_schema import (
    json_object_regex,
    schema_regex,
)
from scalellm_tpu.constrained.tokenmap import (
    TokenFsm,
    pack_bool_mask,
    unpack_mask,
)


def _full(dfa, s: str) -> bool:
    st = dfa.walk(START, s.encode())
    return st != DEAD and bool(dfa.accepting[st])


# ------------------------------------------------------------------ FSM unit


def test_regex_quantifiers_and_classes():
    d = compile_regex(r"[ab]{2,4}c?")
    assert _full(d, "ab") and _full(d, "abab") and _full(d, "ababc")
    assert not _full(d, "a") and not _full(d, "ababab")
    d2 = compile_regex(r"-?\d+(?:\.\d+)?")
    assert _full(d2, "-3.14") and _full(d2, "42")
    assert not _full(d2, "4.") and not _full(d2, "")


def test_regex_alternation_and_escapes():
    d = compile_regex(r"(?:red|green|blue)!\n?")
    assert _full(d, "green!") and _full(d, "red!\n")
    assert not _full(d, "gree")
    d2 = compile_regex(r"[\x41-\x43]+")
    assert _full(d2, "ABC") and not _full(d2, "D")


def test_schema_regex_objects():
    sr = schema_regex(
        {
            "type": "object",
            "properties": {
                "name": {"type": "string"},
                "age": {"type": "integer"},
                "tags": {
                    "type": "array",
                    "items": {"type": "string"},
                    "maxItems": 3,
                },
            },
            "required": ["name", "age"],
        }
    )
    d = compile_regex(sr)
    assert _full(d, '{"name": "bob", "age": 4}')
    assert _full(d, '{"name": "b", "age": 12, "tags": ["x", "y"]}')
    assert not _full(d, '{"age": 4}')
    assert not _full(d, '{"name": "b", "age": 1.5}')


def test_json_object_regex_generic():
    d = compile_regex(json_object_regex(3))
    assert _full(d, '{"a": [1, 2, {"b": null}], "c": "x"}')
    assert _full(d, "{}")
    assert not _full(d, "[1]")


def test_trimming_prevents_dead_ends():
    # after 'a', only 'b' can still reach an accept state
    vocab = [bytes([i]) for i in range(128)]
    tf = TokenFsm(compile_regex("a(?:bc|bd)"), vocab, eos_token_ids=(127,))
    st = tf.next_state(START, ord("a"))
    allowed = np.nonzero(unpack_mask(tf.allowed_packed(st), 128))[0].tolist()
    assert allowed == [ord("b")]


def test_eos_only_when_accepting():
    vocab = [bytes([i]) for i in range(128)]
    tf = TokenFsm(compile_regex("hi"), vocab, eos_token_ids=(10,))
    m0 = unpack_mask(tf.allowed_packed(START), 128)
    assert not m0[10] and m0[ord("h")]
    st = tf.next_state(tf.next_state(START, ord("h")), ord("i"))
    m2 = unpack_mask(tf.allowed_packed(st), 128)
    assert m2[10] and m2.sum() == 1


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    m = rng.random(1000) > 0.3
    assert (unpack_mask(pack_bool_mask(m), 1000) == m).all()


def test_multibyte_tokens_walk_bytewise():
    vocab = [bytes([i]) for i in range(128)] + [b"ab", b"abc"]
    tf = TokenFsm(compile_regex("abc"), vocab, eos_token_ids=(0,))
    allowed = np.nonzero(unpack_mask(tf.allowed_packed(START), 130))[0].tolist()
    assert allowed == [ord("a"), 128, 129]


# ------------------------------------------------------------------ params


def test_params_reject_multiple_guides():
    from scalellm_tpu.errors import ValidationError
    from scalellm_tpu.sampling.params import SamplingParams

    sp = SamplingParams(guided_regex="a", guided_choice=["b"])
    with pytest.raises(ValidationError):
        sp.verify()


# ------------------------------------------------------------------ e2e


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    from scalellm_tpu import LLM

    d = tmp_path_factory.mktemp("tiny_guided")
    model = fixtures.make_tiny_llama(str(d), tokenizer=True)
    return LLM(model, block_size=4, num_blocks=256, enable_cuda_graph=False)


def test_e2e_guided_choice(llm):
    from scalellm_tpu import SamplingParams

    sp = SamplingParams(
        max_tokens=16, temperature=0.0, guided_choice=["yes", "no", "maybe"]
    )
    outs = llm.generate(["pick one:"], sp)
    assert outs[0].finished
    assert outs[0].outputs[0].text in ("yes", "no", "maybe")


def test_e2e_guided_regex(llm):
    from scalellm_tpu import SamplingParams

    sp = SamplingParams(max_tokens=24, temperature=0.8, seed=7,
                        guided_regex=r"[0-9]{3}-[0-9]{4}")
    outs = llm.generate(["call me at "], sp)
    text = outs[0].outputs[0].text
    import re

    assert re.fullmatch(r"[0-9]{3}-[0-9]{4}", text), text


def test_e2e_guided_json_schema(llm):
    from scalellm_tpu import SamplingParams

    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string", "maxLength": 8},
            "count": {"type": "integer"},
        },
        "required": ["name", "count"],
    }
    sp = SamplingParams(
        max_tokens=64, temperature=0.9, seed=3, guided_json=schema
    )
    outs = llm.generate(["produce json:"], sp)
    text = outs[0].outputs[0].text
    obj = json.loads(text)
    assert isinstance(obj["name"], str) and isinstance(obj["count"], int)


def test_e2e_guided_n_sequences_independent(llm):
    from scalellm_tpu import SamplingParams

    sp = SamplingParams(
        max_tokens=12, temperature=1.0, n=2, best_of=2, seed=11,
        guided_choice=["alpha", "beta"],
    )
    outs = llm.generate(["choose:"], sp)
    assert len(outs[0].outputs) == 2
    for seq_out in outs[0].outputs:
        assert seq_out.text in ("alpha", "beta")
