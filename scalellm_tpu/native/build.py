"""Build the native extension in-place: python -m scalellm_tpu.native.build"""

from __future__ import annotations

import os
import subprocess
import sysconfig


def build() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "kv_store.cpp")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, f"_scalellm_native{suffix}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", src, "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


if __name__ == "__main__":
    print(build())
