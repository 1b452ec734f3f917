"""OpenAI-compatible /v1/chat/completions client (reference parity:
examples/openai_chat_client.py), including a tool-calling turn — start the
server first:

    python -m scalellm_tpu.serve.api_server --model <path> --port 8080
"""

import json
import sys

import requests

BASE = sys.argv[1] if len(sys.argv) > 1 else "http://localhost:8080"


def chat(messages, stream=False, tools=None):
    body = {
        "model": "default",
        "messages": messages,
        "max_tokens": 128,
        "temperature": 0.7,
        "stream": stream,
    }
    if tools:
        body["tools"] = tools
    if not stream:
        r = requests.post(f"{BASE}/v1/chat/completions", json=body, timeout=300)
        r.raise_for_status()
        return r.json()["choices"][0]["message"]
    with requests.post(
        f"{BASE}/v1/chat/completions", json=body, stream=True, timeout=300
    ) as r:
        r.raise_for_status()
        for line in r.iter_lines():
            if not line or not line.startswith(b"data:"):
                continue
            payload = line[len(b"data:"):].strip()
            if payload == b"[DONE]":
                break
            delta = json.loads(payload)["choices"][0]["delta"]
            print(delta.get("content") or "", end="", flush=True)
    print()


if __name__ == "__main__":
    print("--- non-streaming")
    msg = chat([{"role": "user", "content": "Name three TPU generations."}])
    print(msg["content"])

    print("--- streaming")
    chat([{"role": "user", "content": "Explain KV caching in one sentence."}],
         stream=True)

    print("--- tool calling")
    tools = [{
        "type": "function",
        "function": {
            "name": "get_weather",
            "description": "Get the current weather for a city",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string"}},
                "required": ["city"],
            },
        },
    }]
    msg = chat(
        [{"role": "user", "content": "What's the weather in Tokyo?"}],
        tools=tools,
    )
    print(json.dumps(msg.get("tool_calls"), indent=2))
