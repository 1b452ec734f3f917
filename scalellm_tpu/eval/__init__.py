"""Accuracy evaluation harness: perplexity scoring + quantization
calibration (BASELINE acceptance: quantized serving must match the
reference engine's perplexity at the same bit-width)."""
