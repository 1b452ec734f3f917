from scalellm_tpu.speculative.rejection_sampler import rejection_sample
from scalellm_tpu.speculative.speculative_engine import SpeculativeEngine

__all__ = ["rejection_sample", "SpeculativeEngine"]
