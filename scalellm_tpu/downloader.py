"""Model download helper (parity with the reference's scalellm/downloader.py:
HF Hub snapshot download + optional torch-pickle → safetensors conversion)."""

from __future__ import annotations

import glob
import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def download_hf_model(
    repo_id: str,
    revision: Optional[str] = None,
    allow_patterns: Optional[list] = None,
    cache_dir: Optional[str] = None,
    convert_to_safetensors: bool = True,
) -> str:
    """Snapshot-download a model folder from the HuggingFace Hub. Returns
    the local path. Requires network access; raises a clear error otherwise.
    """
    from huggingface_hub import snapshot_download

    patterns = allow_patterns or [
        "*.json", "*.safetensors", "*.bin", "*.model", "*.tiktoken", "*.txt",
    ]
    try:
        path = snapshot_download(
            repo_id, revision=revision, allow_patterns=patterns,
            cache_dir=cache_dir,
        )
    except Exception as e:
        raise RuntimeError(
            f"failed to download {repo_id!r} (no network access?): {e}"
        ) from e
    if convert_to_safetensors and not glob.glob(os.path.join(path, "*.safetensors")):
        convert_bin_to_safetensors(path)
    return path


def convert_bin_to_safetensors(model_path: str) -> None:
    """Convert torch-pickle weight files to safetensors in place
    (reference: scalellm/downloader.py bin→safetensors conversion)."""
    import torch
    from safetensors.torch import save_file

    for bin_path in glob.glob(os.path.join(model_path, "*.bin")):
        logger.info("converting %s to safetensors", bin_path)
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        sd = {k: v.contiguous() for k, v in sd.items() if isinstance(v, torch.Tensor)}
        out = bin_path[: -len(".bin")] + ".safetensors"
        save_file(sd, out)
