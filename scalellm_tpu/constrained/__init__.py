"""Grammar-constrained (guided) decoding.

Capability extension beyond the reference engine (which has none):
regex / JSON-schema / choice-list constrained generation, vLLM-style.
Byte-level DFAs (fsm.py) bound to the tokenizer vocabulary (tokenmap.py)
produce per-step packed allowed-token bitmasks applied inside the jitted
sampler (sampling/sampler.py:apply_allowed_mask).
"""

from scalellm_tpu.constrained.fsm import Dfa, compile_regex
from scalellm_tpu.constrained.guided import (
    FsmCache,
    constraint_regex,
    token_vocab_bytes,
)
from scalellm_tpu.constrained.json_schema import (
    json_object_regex,
    json_value_regex,
    schema_regex,
)
from scalellm_tpu.constrained.tokenmap import GuidedState, TokenFsm

__all__ = [
    "Dfa",
    "compile_regex",
    "FsmCache",
    "constraint_regex",
    "token_vocab_bytes",
    "json_object_regex",
    "json_value_regex",
    "schema_regex",
    "GuidedState",
    "TokenFsm",
]
