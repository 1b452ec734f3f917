from scalellm_tpu.sampling.params import SamplingParams

__all__ = ["SamplingParams"]
