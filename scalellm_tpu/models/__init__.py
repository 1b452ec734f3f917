from scalellm_tpu.models.registry import ModelRegistry

# Import model modules for registration side effects.
from scalellm_tpu.models import llama  # noqa: F401
from scalellm_tpu.models import gemma  # noqa: F401
from scalellm_tpu.models import gemma2  # noqa: F401
from scalellm_tpu.models import gpt2  # noqa: F401
from scalellm_tpu.models import mistral  # noqa: F401
from scalellm_tpu.models import phi  # noqa: F401
from scalellm_tpu.models import qwen  # noqa: F401
from scalellm_tpu.models import qwen2  # noqa: F401
from scalellm_tpu.models import mixtral  # noqa: F401
from scalellm_tpu.models import qwen2_moe  # noqa: F401
from scalellm_tpu.models import deepseek  # noqa: F401
from scalellm_tpu.models import mpt  # noqa: F401
from scalellm_tpu.models import bloom  # noqa: F401

__all__ = ["ModelRegistry"]
