from scalellm_tpu.quantization.formats import (
    unpack_awq_tensor,
    unpack_gptq_tensor,
    unpack_awq_zeros,
    unpack_gptq_zeros,
)

__all__ = [
    "unpack_awq_tensor",
    "unpack_gptq_tensor",
    "unpack_awq_zeros",
    "unpack_gptq_zeros",
]
