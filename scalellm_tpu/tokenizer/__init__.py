from scalellm_tpu.tokenizer.tokenizer import HFTokenizer, load_tokenizer

__all__ = ["HFTokenizer", "load_tokenizer"]
