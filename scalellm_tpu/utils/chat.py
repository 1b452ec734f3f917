"""Chat messages and template application.

TPU-native equivalent of the reference's chat-template layer
(reference: src/chat_template/chat_template.h:20, common_chat_template.h).
The reference parses jinja `chat_template` from tokenizer_config into
TokenizerArgs (tokenizer_args.h:33) but only executes hardcoded coded
templates; here jinja2 is available, so jinja templates execute too and the
coded per-model templates serve as the fallback.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence


@dataclass
class Message:
    role: str
    content: str


def apply_chat_template(
    messages: Sequence[Message],
    jinja_template: Optional[str] = None,
    model_type: str = "",
) -> str:
    if jinja_template:
        try:
            return _render_jinja(jinja_template, messages)
        except Exception:
            pass  # fall through to coded template
    from scalellm_tpu.models.registry import ModelRegistry

    coded = ModelRegistry.get_default_chat_template(model_type)
    if coded is None:
        raise ValueError(
            f"no chat template available for model type {model_type!r}"
        )
    return coded(messages)


def _render_jinja(template: str, messages: Sequence[Message]) -> str:
    import jinja2

    from jinja2.sandbox import ImmutableSandboxedEnvironment

    # Sandboxed: checkpoint-supplied templates are untrusted input; a plain
    # Environment would allow __class__/__subclasses__ gadget chains to reach
    # arbitrary code execution (HF transformers sandboxes for the same reason).
    env = ImmutableSandboxedEnvironment(
        loader=jinja2.BaseLoader(), trim_blocks=True, lstrip_blocks=True
    )
    env.globals["raise_exception"] = _raise_exception
    tmpl = env.from_string(template)
    return tmpl.render(
        messages=[{"role": m.role, "content": m.content} for m in messages],
        add_generation_prompt=True,
    )


def _raise_exception(msg):
    raise ValueError(msg)
