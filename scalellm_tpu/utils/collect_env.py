"""Environment report for bug reports (parity with the reference's
scalellm/utils/collect_env.py). Run: python -m scalellm_tpu.utils.collect_env
"""

from __future__ import annotations

import platform
import sys


def collect_env() -> dict:
    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "processor": platform.processor(),
    }
    try:
        from scalellm_tpu.version import __version__

        info["scalellm_tpu"] = __version__
    except Exception:
        pass
    for mod in ("jax", "jaxlib", "numpy", "transformers", "safetensors"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "unknown")
        except Exception:
            info[mod] = "not installed"
    try:
        import jax

        info["jax_backend"] = jax.default_backend()
        info["devices"] = [str(d) for d in jax.devices()]
        info["process_count"] = jax.process_count()
    except Exception as e:
        info["jax_backend"] = f"error: {e}"
    try:
        from scalellm_tpu.native import load

        info["native_extension"] = load() is not None
    except Exception:
        info["native_extension"] = False
    return info


def main():
    for k, v in collect_env().items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
