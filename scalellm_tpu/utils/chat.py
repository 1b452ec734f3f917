"""Chat message type (reference: scalellm Message in csrc bindings)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Message:
    role: str
    content: str
