"""Native (C++) runtime components.

The compiled `_scalellm_native` extension provides the KV block allocator +
prefix-cache trie (kv_store.cpp). `load()` builds it on first use (g++ via
python -m scalellm_tpu.native.build) and returns the module, or None when no
toolchain is available — callers fall back to the pure-Python
implementations in scalellm_tpu/memory/.
"""

from __future__ import annotations

import importlib
import logging
import os

logger = logging.getLogger(__name__)

_cached = None
_tried = False


def load():
    """Import (building if needed) the native module; None if unavailable."""
    global _cached, _tried
    if _tried:
        return _cached
    _tried = True
    if os.environ.get("SCALELLM_DISABLE_NATIVE"):
        return None
    try:
        _cached = importlib.import_module("scalellm_tpu.native._scalellm_native")
        return _cached
    except ImportError:
        pass
    try:
        from scalellm_tpu.native.build import build

        build()
        _cached = importlib.import_module("scalellm_tpu.native._scalellm_native")
    except Exception as e:  # no toolchain / build failure → pure-python path
        logger.info("native extension unavailable (%s); using pure python", e)
        _cached = None
    return _cached
