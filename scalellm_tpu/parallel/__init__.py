from scalellm_tpu.parallel.config import ParallelConfig
from scalellm_tpu.parallel.mesh import make_mesh

__all__ = ["ParallelConfig", "make_mesh"]
