"""OpenAI-compatible /v1/completions client (reference parity:
examples/openai_complete_client.py), using plain HTTP — start the server
first:

    python -m scalellm_tpu.serve.api_server --model <path> --port 8080
"""

import json
import sys

import requests

BASE = sys.argv[1] if len(sys.argv) > 1 else "http://localhost:8080"


def complete(prompt: str, stream: bool = False):
    body = {
        "model": "default",
        "prompt": prompt,
        "max_tokens": 64,
        "temperature": 0.7,
        "stream": stream,
    }
    if not stream:
        r = requests.post(f"{BASE}/v1/completions", json=body, timeout=300)
        r.raise_for_status()
        print(r.json()["choices"][0]["text"])
        return
    with requests.post(
        f"{BASE}/v1/completions", json=body, stream=True, timeout=300
    ) as r:
        r.raise_for_status()
        for line in r.iter_lines():
            if not line or not line.startswith(b"data:"):
                continue
            payload = line[len(b"data:"):].strip()
            if payload == b"[DONE]":
                break
            chunk = json.loads(payload)
            print(chunk["choices"][0]["text"], end="", flush=True)
    print()


if __name__ == "__main__":
    print("--- non-streaming")
    complete("The three laws of robotics are")
    print("--- streaming")
    complete("Once upon a time on a TPU pod,", stream=True)
