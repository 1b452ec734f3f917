from scalellm_tpu.models.registry import ModelRegistry

# Import model modules for registration side effects.
from scalellm_tpu.models import llama  # noqa: F401

__all__ = ["ModelRegistry"]
