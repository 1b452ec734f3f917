"""Async streaming chat (parity with the reference's async_stream example)."""

import asyncio
import sys

from scalellm_tpu import AsyncLLMEngine, Message, SamplingParams


async def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "meta-llama/Llama-3.1-8B"
    engine = AsyncLLMEngine(model)
    engine.start()
    try:
        stream = await engine.schedule_chat_async(
            [Message("user", "Explain paged attention in one paragraph.")],
            SamplingParams(max_tokens=128, temperature=0.7),
            stream=True,
        )
        async for out in stream:
            for seq in out.outputs:
                print(seq.text, end="", flush=True)
        print()
    finally:
        engine.stop()


if __name__ == "__main__":
    asyncio.run(main())
