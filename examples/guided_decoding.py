"""Grammar-constrained decoding (beyond the reference's examples): force
the model's output to match a regex, a JSON schema, or a choice list via
the in-graph FSM token masks (constrained/fsm.py)."""

import sys

from scalellm_tpu import LLM, SamplingParams


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "meta-llama/Llama-3.1-8B"
    llm = LLM(model)

    # Regex: a date
    sp = SamplingParams(
        max_tokens=16, temperature=0.0,
        guided_regex=r"\d{4}-\d{2}-\d{2}",
    )
    print("date:", llm.generate(["Today's date is "], sp)[0].outputs[0].text)

    # JSON schema
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "year": {"type": "integer"},
        },
        "required": ["name", "year"],
    }
    sp = SamplingParams(max_tokens=64, temperature=0.0, guided_json=schema)
    print("json:", llm.generate(
        ["Describe the first TPU as JSON: "], sp)[0].outputs[0].text)

    # Choice list
    sp = SamplingParams(
        max_tokens=8, temperature=0.0,
        guided_choice=["positive", "negative", "neutral"],
    )
    print("sentiment:", llm.generate(
        ["Sentiment of 'this chip is blazing fast': "], sp)[0].outputs[0].text)


if __name__ == "__main__":
    main()
