"""OpenAI-compatible REST serving (reference: scalellm/serve/)."""
