"""Examples stay runnable: every example compiles, and the offline ones
execute end-to-end against the tiny fixture checkpoint (reference analog:
the reference ships 9 runnable examples under examples/)."""

import glob
import os
import py_compile
import subprocess
import sys

import pytest

from tests.fixtures import trained_tiny_llama_cached

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Examples import the installed package; in-tree runs need the repo root
# (keep any existing PYTHONPATH, e.g. the axon site dir).
ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "PYTHONPATH": ":".join(
        p for p in (os.environ.get("PYTHONPATH"), REPO) if p
    ),
}


def test_all_examples_compile():
    paths = sorted(glob.glob(os.path.join(REPO, "examples", "*.py")))
    assert len(paths) >= 10
    for p in paths:
        py_compile.compile(p, doraise=True)


@pytest.mark.parametrize(
    "script", ["offline_inference.py", "cpu_offline_inference.py"]
)
def test_offline_examples_run(script):
    path = trained_tiny_llama_cached()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), path],
        capture_output=True, text=True, timeout=600,
        env=ENV,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip()


def test_guided_decoding_example_runs():
    path = trained_tiny_llama_cached()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "guided_decoding.py"),
         path],
        capture_output=True, text=True, timeout=900,
        env=ENV,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "date:" in out.stdout
