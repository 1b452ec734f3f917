from scalellm_tpu.handlers.llm_handler import LLMHandler, LLMHandlerOptions

__all__ = ["LLMHandler", "LLMHandlerOptions"]
