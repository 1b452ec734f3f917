from scalellm_tpu.model_loader.loader import HFModelLoader

__all__ = ["HFModelLoader"]
