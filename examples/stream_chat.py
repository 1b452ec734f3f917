"""Synchronous multi-turn streaming chat (reference parity:
examples/stream_chat.py) — type a message, stream the reply, repeat."""

import sys

from scalellm_tpu import AsyncLLMEngine, Message, SamplingParams


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "meta-llama/Llama-3.1-8B"
    engine = AsyncLLMEngine(model)
    engine.start()
    messages = [Message("system", "You are a helpful assistant.")]
    try:
        while True:
            try:
                user = input("\n[user]: ").strip()
            except EOFError:
                break
            if not user or user in ("exit", "quit"):
                break
            messages.append(Message("user", user))
            stream = engine.schedule_chat(
                messages,
                SamplingParams(max_tokens=256, temperature=0.7),
                stream=True,
            )
            print("[assistant]: ", end="", flush=True)
            reply = []
            for out in stream:
                for seq in out.outputs:
                    reply.append(seq.text)
                    print(seq.text, end="", flush=True)
            print()
            messages.append(Message("assistant", "".join(reply)))
    finally:
        engine.stop()


if __name__ == "__main__":
    main()
