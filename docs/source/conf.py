# Sphinx configuration for the scalellm-tpu documentation.
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "scalellm-tpu"
copyright = "2026, scalellm-tpu contributors"
author = "scalellm-tpu contributors"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

templates_path = ["_templates"]
exclude_patterns = []

html_theme = "alabaster"
autodoc_mock_imports = ["jax", "jaxlib", "flax", "optax"]
