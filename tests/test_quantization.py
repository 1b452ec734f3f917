"""Weight-only quantization tests: format unpack round-trips, the fused
dequant+matmul reference, and end-to-end AWQ/GPTQ checkpoint loading
(mirrors the reference's qlinear tests + gptq_small.safetensors fixture)."""

import json
import os

import numpy as np
import pytest

from scalellm_tpu.quantization.formats import (
    AWQ_ORDER,
    unpack_awq_tensor,
    unpack_awq_zeros,
    unpack_gptq_tensor,
    unpack_gptq_zeros,
)


# ------------------------------------------------------------- pack helpers


def pack_awq(u: np.ndarray) -> np.ndarray:
    """[K, N] unsigned nibbles → AWQ i32[K, N/8]."""
    K, N = u.shape
    out = np.zeros((K, N // 8), dtype=np.uint32)
    for i in range(8):
        out |= (u[:, AWQ_ORDER[i]::8].astype(np.uint32) & 0xF) << (4 * i)
    return out.astype(np.int32)


def pack_gptq(u: np.ndarray) -> np.ndarray:
    """[K, N] unsigned nibbles → GPTQ i32[K/8, N] (packed along K)."""
    K, N = u.shape
    out = np.zeros((K // 8, N), dtype=np.uint32)
    for i in range(8):
        out |= (u[i::8].astype(np.uint32) & 0xF) << (4 * i)
    return out.astype(np.int32)


def pack_zeros_awq(z: np.ndarray) -> np.ndarray:
    return pack_awq(z.astype(np.uint8))


def pack_zeros_gptq(z: np.ndarray) -> np.ndarray:
    """GPTQ stores z-1, sequential nibble order along N."""
    zm = (z.astype(np.int32) - 1).astype(np.uint8)
    G, N = zm.shape
    out = np.zeros((G, N // 8), dtype=np.uint32)
    for i in range(8):
        out |= (zm[:, i::8].astype(np.uint32) & 0xF) << (4 * i)
    return out.astype(np.int32)


# ------------------------------------------------------------- unit tests


def test_awq_roundtrip():
    rng = np.random.default_rng(0)
    u = rng.integers(0, 16, (16, 32)).astype(np.uint8)
    assert (unpack_awq_tensor(pack_awq(u)) == u).all()


def test_gptq_roundtrip():
    rng = np.random.default_rng(1)
    u = rng.integers(0, 16, (32, 16)).astype(np.uint8)
    assert (unpack_gptq_tensor(pack_gptq(u)) == u).all()


def test_gptq_zeros_plus_one():
    z = np.full((2, 16), 8, np.uint8)
    packed = pack_zeros_gptq(z)
    assert (unpack_gptq_zeros(packed) == 8).all()


def test_awq_zeros_roundtrip():
    rng = np.random.default_rng(2)
    z = rng.integers(0, 16, (4, 16)).astype(np.uint8)
    assert (unpack_awq_zeros(pack_zeros_awq(z)) == z).all()


def test_quant_matmul_ref():
    import jax.numpy as jnp

    from scalellm_tpu.ops.quant_matmul import (
        quantize_int4,
        ref_quant_matmul,
    )

    rng = np.random.default_rng(3)
    K, N, G, M = 64, 32, 32, 4
    w = (rng.standard_normal((K, N)) * 0.1).astype(np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)
    qw, sc, zp = quantize_int4(w, G)
    out = np.asarray(
        ref_quant_matmul(
            jnp.asarray(x), jnp.asarray(qw), jnp.asarray(sc), jnp.asarray(zp), 4
        )
    )
    # int4 quantization error bound: scale/2 per element accumulated over K
    ref = x @ w
    err = np.abs(out - ref).max()
    assert err < 0.1 * np.abs(ref).max() + 0.05


# ------------------------------------------------------------- end-to-end


def _quantize_checkpoint(
    src_dir: str, dst_dir: str, fmt: str, group: int = 32,
    desc_act: bool = False, seed: int = 7,
):
    """Build an AWQ/GPTQ checkpoint from a float tiny-llama checkpoint,
    and a matching dequantized float checkpoint for comparison.

    desc_act=True (gptq only) quantizes rows in a random activation order
    and stores g_idx, like AutoGPTQ's act-order checkpoints."""
    from safetensors import safe_open
    from safetensors.numpy import save_file

    from scalellm_tpu.ops.quant_matmul import quantize_int4

    os.makedirs(dst_dir, exist_ok=True)
    deq_dir = dst_dir + "_dequant"
    os.makedirs(deq_dir, exist_ok=True)
    act_rng = np.random.default_rng(seed)

    proj_suffixes = tuple(
        f"{p}.weight"
        for p in (
            "q_proj", "k_proj", "v_proj", "o_proj",
            "gate_proj", "up_proj", "down_proj",
        )
    )
    src_st = [f for f in os.listdir(src_dir) if f.endswith(".safetensors")][0]
    out_q, out_f = {}, {}
    with safe_open(os.path.join(src_dir, src_st), framework="numpy") as f:
        for name in f.keys():
            t = f.get_tensor(name)
            if name.endswith(proj_suffixes):
                w = t.T.astype(np.float32)  # [in, out]
                if desc_act:
                    K = w.shape[0]
                    act_order = act_rng.permutation(K)
                    g_idx = np.empty(K, np.int32)
                    g_idx[act_order] = np.arange(K, dtype=np.int32) // group
                    w = w[act_order]  # quantize in activation order
                qw_packed, sc, zp_signed = quantize_int4(w, group)
                # canonical packs SIGNED nibbles (value-8); recover the
                # checkpoint's unsigned nibbles and its unsigned zero point
                lo = qw_packed.astype(np.int32) & 0xF
                hi = (qw_packed.astype(np.int32) >> 4) & 0xF
                sx = lambda v: ((v ^ 8) - 8)  # sign-extend nibble
                u = (
                    np.stack([sx(lo), sx(hi)], axis=1).reshape(w.shape) + 8
                ).astype(np.uint8)
                zp = (zp_signed.astype(np.int32) + 8).astype(np.uint8)
                # dequantized float copy (what the kernel should compute) —
                # scales go through the checkpoint's f16 rounding
                z = np.repeat(zp.astype(np.int32), group, axis=0)
                s = np.repeat(sc.astype(np.float16).astype(np.float32), group, axis=0)
                wf = (u.astype(np.int32) - z).astype(np.float32) * s
                if desc_act:
                    # scatter rows back to original K order; groups stay
                    # indexed by g_idx
                    u_orig = np.empty_like(u)
                    u_orig[act_order] = u
                    wf_orig = np.empty_like(wf)
                    wf_orig[act_order] = wf
                    u, wf = u_orig, wf_orig
                stem = name[: -len(".weight")]
                if fmt == "awq":
                    out_q[stem + ".qweight"] = pack_awq(u)
                    out_q[stem + ".qzeros"] = pack_zeros_awq(zp)
                else:
                    out_q[stem + ".qweight"] = pack_gptq(u)
                    out_q[stem + ".qzeros"] = pack_zeros_gptq(zp)
                    if desc_act:
                        out_q[stem + ".g_idx"] = g_idx
                out_q[stem + ".scales"] = sc.astype(np.float16)
                # ascontiguousarray: safetensors writes the raw buffer and a
                # transposed view would silently save transposed data
                out_f[name] = np.ascontiguousarray(wf.T, dtype=np.float32)
            else:
                out_q[name] = t
                out_f[name] = t
    save_file(out_q, os.path.join(dst_dir, "model.safetensors"))
    save_file(out_f, os.path.join(deq_dir, "model.safetensors"))

    with open(os.path.join(src_dir, "config.json")) as f:
        cfg = json.load(f)
    qcfg = dict(cfg)
    qcfg["quantization_config"] = {
        "quant_method": fmt,
        "bits": 4,
        "group_size": group,
        "zero_point": fmt == "awq",
        "sym": True,
        "desc_act": desc_act,
    }
    with open(os.path.join(dst_dir, "config.json"), "w") as f:
        json.dump(qcfg, f)
    with open(os.path.join(deq_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
    for extra in ("tokenizer.json", "generation_config.json"):
        p = os.path.join(src_dir, extra)
        if os.path.exists(p):
            import shutil

            shutil.copy(p, os.path.join(dst_dir, extra))
            shutil.copy(p, os.path.join(deq_dir, extra))
    return dst_dir, deq_dir


@pytest.mark.parametrize("fmt", ["awq", "gptq"])
def test_quantized_checkpoint_generate(tmp_path, fmt):
    """Loading an AWQ/GPTQ checkpoint must generate the same greedy tokens
    as the equivalent dequantized float checkpoint."""
    import tests.fixtures as fixtures
    from scalellm_tpu import LLM, SamplingParams

    src = str(tmp_path / "src")
    fixtures.make_tiny_llama(src, tokenizer=True)
    qdir, fdir = _quantize_checkpoint(str(tmp_path / fmt), None, fmt) if False else _quantize_checkpoint(src, str(tmp_path / fmt), fmt)

    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    ref_llm = LLM(fdir, block_size=4, num_blocks=128, enable_cuda_graph=False)
    expected = ref_llm.generate(["hello world"], sp)[0].outputs[0].token_ids
    del ref_llm

    qllm = LLM(qdir, block_size=4, num_blocks=128, enable_cuda_graph=False)
    got = qllm.generate(["hello world"], sp)[0].outputs[0].token_ids
    assert got == expected


@pytest.mark.parametrize("fmt", ["gptq", "exllamav2"])
def test_desc_act_checkpoint_generate(tmp_path, fmt):
    """GPTQ desc_act=True (activation-order groups): rows are re-sorted
    into contiguous groups at load with a runtime input gather; generation
    must match the dequantized float checkpoint exactly. "exllamav2" is the
    same serialized format under a different quant_method name."""
    import json as _json

    import tests.fixtures as fixtures
    from scalellm_tpu import LLM, SamplingParams

    src = str(tmp_path / "src")
    fixtures.make_tiny_llama(src, tokenizer=True)
    qdir, fdir = _quantize_checkpoint(
        src, str(tmp_path / "gptq_da"), "gptq", desc_act=True
    )
    if fmt == "exllamav2":
        cfg_p = os.path.join(qdir, "config.json")
        with open(cfg_p) as f:
            cfg = _json.load(f)
        cfg["quantization_config"]["quant_method"] = "exllamav2"
        with open(cfg_p, "w") as f:
            _json.dump(cfg, f)

    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    ref_llm = LLM(fdir, block_size=4, num_blocks=128, enable_cuda_graph=False)
    expected = ref_llm.generate(["hello world"], sp)[0].outputs[0].token_ids
    del ref_llm

    qllm = LLM(qdir, block_size=4, num_blocks=128, enable_cuda_graph=False)
    got = qllm.generate(["hello world"], sp)[0].outputs[0].token_ids
    assert got == expected
