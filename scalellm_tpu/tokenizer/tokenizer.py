"""Tokenizer layer.

TPU-native equivalent of the reference's tokenizer stack
(reference: src/tokenizer/tokenizer.h:26, hf_tokenizer.h:10 and the Rust
bridge src/huggingface/src/lib.rs). The Rust `tokenizers` crate is used via
its official Python binding (the `tokenizers` package) instead of a C-ABI
bridge; sentencepiece `tokenizer.model` folders are handled through
transformers' AutoTokenizer fallback.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence


class HFTokenizer:
    """Wraps a fast `tokenizers.Tokenizer` (tokenizer.json)."""

    def __init__(self, tok, chat_template: Optional[str] = None, special_ids=None):
        self._tok = tok
        self.chat_template = chat_template
        self._special_ids = set(special_ids or [])

    @classmethod
    def from_file(cls, path: str, chat_template: Optional[str] = None) -> "HFTokenizer":
        from tokenizers import Tokenizer

        tok = Tokenizer.from_file(path)
        return cls(tok, chat_template)

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        return self._tok.encode(text, add_special_tokens=add_special_tokens).ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=skip_special_tokens)

    def id_to_token(self, token_id: int) -> str:
        t = self._tok.id_to_token(int(token_id))
        return t if t is not None else ""

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def clone(self) -> "HFTokenizer":
        # tokenizers objects are thread-safe for encode/decode; share it.
        return self


class TransformersTokenizer:
    """Fallback via transformers AutoTokenizer (handles sentencepiece
    tokenizer.model folders — reference: sentencepiece_tokenizer.h:14)."""

    def __init__(self, tok):
        self._tok = tok
        self.chat_template = getattr(tok, "chat_template", None)

    @classmethod
    def from_path(cls, path: str) -> "TransformersTokenizer":
        from transformers import AutoTokenizer

        return cls(AutoTokenizer.from_pretrained(path))

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        return self._tok.encode(text, add_special_tokens=add_special_tokens)

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=skip_special_tokens)

    def id_to_token(self, token_id: int) -> str:
        return self._tok.convert_ids_to_tokens(int(token_id)) or ""

    @property
    def vocab_size(self) -> int:
        return len(self._tok)

    def clone(self):
        return self


class TiktokenTokenizer:
    """BPE ranks file tokenizer (reference: tiktoken_tokenizer.h:15 — ranks
    file + regex pattern via re2; here the official tiktoken package)."""

    DEFAULT_PATTERN = (
        r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"""
        r"""| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
    )

    def __init__(self, ranks_path: str, pattern: Optional[str] = None,
                 special_tokens: Optional[dict] = None,
                 chat_template: Optional[str] = None):
        import tiktoken

        with open(ranks_path, "rb") as f:
            ranks = {}
            for line in f:
                if not line.strip():
                    continue
                import base64

                token_b64, rank = line.split()
                ranks[base64.b64decode(token_b64)] = int(rank)
        n = len(ranks)
        specials = special_tokens or {}
        self._enc = tiktoken.Encoding(
            name=os.path.basename(ranks_path),
            pat_str=pattern or self.DEFAULT_PATTERN,
            mergeable_ranks=ranks,
            special_tokens={k: n + i for i, k in enumerate(specials)}
            if isinstance(specials, (list, tuple))
            else specials,
        )
        self.chat_template = chat_template

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        return self._enc.encode(text, disallowed_special=())

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self._enc.decode(list(ids))

    def id_to_token(self, token_id: int) -> str:
        try:
            return self._enc.decode([int(token_id)])
        except Exception:
            return ""

    @property
    def vocab_size(self) -> int:
        return self._enc.n_vocab

    def clone(self):
        return self


def load_tokenizer(model_path: str, chat_template: Optional[str] = None):
    """Pick the right backend for a model folder
    (reference: HFModelLoader tokenizer discovery, model_loader.cpp)."""
    tj = os.path.join(model_path, "tokenizer.json")
    if chat_template is None:
        tc = os.path.join(model_path, "tokenizer_config.json")
        if os.path.exists(tc):
            with open(tc) as f:
                chat_template = json.load(f).get("chat_template")
    if os.path.exists(tj):
        return HFTokenizer.from_file(tj, chat_template)
    tiktoken_files = [
        f for f in os.listdir(model_path) if f.endswith(".tiktoken")
    ]
    if tiktoken_files:
        return TiktokenTokenizer(
            os.path.join(model_path, tiktoken_files[0]),
            chat_template=chat_template,
        )
    return TransformersTokenizer.from_path(model_path)
