"""HuggingFace model-folder loader.

TPU-native equivalent of the reference's HFModelLoader + StateDict
(reference: src/model_loader/model_loader.h:63,83, model_loader.cpp:63-81,
state_dict.h:12). Reads config.json through the registry's per-model args
loader, detects quantization config, and streams *.safetensors files one at
a time (bounding host memory like the reference's lazy StateDictIterator,
model_loader.h:17-61) into the model's stacked param pytree.

Weight-name mapping comes from the model's `hf_weight_rules`:
(regex, our_path, transpose). Per-layer tensors are written into
preallocated stacked buffers at their layer index. Every expected param must
be fully written — verified at the end (parity with verify_loaded_weights,
reference: causal_lm.h:76-82).
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from scalellm_tpu.config import ModelArgs, QuantArgs, TokenizerArgs
from scalellm_tpu.models.registry import ModelRegistry


logger = logging.getLogger(__name__)


class HFModelLoader:
    def __init__(self, model_path: str):
        assert os.path.isdir(model_path), f"not a model folder: {model_path}"
        self.model_path = model_path
        cfg_path = os.path.join(model_path, "config.json")
        with open(cfg_path) as f:
            self.hf_config: Dict[str, Any] = json.load(f)
        self.model_type = self.hf_config.get("model_type", "")

        loader = ModelRegistry.get_model_args_loader(self.model_type)
        if loader is None:
            raise ValueError(
                f"unsupported model type {self.model_type!r}; supported: "
                f"{ModelRegistry.supported_model_types()}"
            )
        self.model_args: ModelArgs = loader(self.hf_config)

        # Quantization config: inline (HF style) or sidecar file
        # (reference: model_loader.cpp quant(ize)_config.json detection).
        qcfg = dict(self.hf_config)
        for name in ("quantize_config.json", "quant_config.json"):
            p = os.path.join(model_path, name)
            if os.path.exists(p) and "quantization_config" not in qcfg:
                with open(p) as f:
                    qcfg["quantization_config"] = json.load(f)
                break
        self.quant_args = QuantArgs.from_hf_config(qcfg)
        self.model_args.quant_args = self.quant_args if self.quant_args.enabled else None

        self.tokenizer_args = self._load_tokenizer_args()

        # Weight files: prefer safetensors (reference: model_loader.cpp:63-81).
        self.weight_files = sorted(
            os.path.join(model_path, f)
            for f in os.listdir(model_path)
            if f.endswith(".safetensors")
        )

    def _load_tokenizer_args(self) -> TokenizerArgs:
        args = TokenizerArgs()
        tc_path = os.path.join(self.model_path, "tokenizer_config.json")
        if os.path.exists(tc_path):
            with open(tc_path) as f:
                tc = json.load(f)
            args.chat_template = tc.get("chat_template")
        return args

    # ---------------------------------------------------------------- params

    def load_params(
        self,
        model,
        verify: bool = True,
    ) -> Dict[str, Any]:
        """Load weights into the model's stacked param layout (numpy pytree;
        device placement is the executor's job)."""
        args = self.model_args
        # Synthetic weights for serving benchmarks (SCALELLM_FAKE_LOAD=zero):
        # skip file reads and return zero params in the exact runtime layout.
        # Step timing is identical (quantized or dense) — only the values
        # are meaningless — so benches avoid pushing GBs through the loader.
        if os.environ.get("SCALELLM_FAKE_LOAD") == "zero":
            return self._zero_params(model)
        rules: List[Tuple] = list(model.hf_weight_rules)
        if self.quant_args.enabled:
            from scalellm_tpu.quantization.linear import build_quant_rules

            rules = build_quant_rules(rules, self.quant_args)
        compiled = []
        for rule in rules:
            rx, path, transpose = rule[:3]
            transform = rule[3] if len(rule) > 3 else None
            index_map = rule[4] if len(rule) > 4 else None
            compiled.append(
                (re.compile(rx + r"$"), path, transpose, transform, index_map)
            )

        shapes = (
            model.load_param_shapes()
            if hasattr(model, "load_param_shapes")
            else model.param_shapes()
        )
        import ml_dtypes

        np_dtype = {
            "bfloat16": ml_dtypes.bfloat16,
            "float16": np.float16,
            "float32": np.float32,
        }[args.dtype]

        bufs: Dict[str, np.ndarray] = {}
        filled: Dict[str, np.ndarray] = {}  # path -> bool mask over layer dim

        def leaf_dtype(path: str):
            leaf = path.rsplit(".", 1)[-1]
            if leaf in ("qweight", "zeros"):
                return np.int8
            if leaf == "scales":
                # External GPTQ/AWQ checkpoints store scales as fp16 and
                # computed their int grids against those exact values;
                # bf16 (7 mantissa bits) cannot represent all fp16 scales,
                # so upcast to f32 (exact — Mosaic rejects f16 on TPU).
                # Only the INTERNAL quantizer may use bf16 scales, where
                # the grid round-trips the storage dtype (quant_matmul.
                # scales_np_dtype).
                return np.float32
            if leaf in ("g_idx", "perm"):
                return np.int32
            return np_dtype

        def ensure_buf(path: str, n_idx: int):
            if path in bufs:
                return
            node = shapes
            for part in path.split("."):
                node = node[part]
            bufs[path] = np.zeros(node, dtype=leaf_dtype(path))
            # One fill flag per leading index tuple (layer, [expert, ...]).
            lead = node[:n_idx] if n_idx else (1,)
            filled[path] = np.zeros(lead, dtype=bool)

        kv_rep = getattr(model, "kv_replication", 1)
        kv_paths = {"layers.k_proj", "layers.v_proj", "layers.k_bias", "layers.v_bias"}

        from safetensors import safe_open

        def store(path, m, tensor, index_map=None) -> bool:
            """Returns False when the rule's index_map rejects this tensor
            (the match loop then tries later rules — e.g. deepseek routes a
            layer tensor into either the dense or the moe stack)."""
            if path == "lm_head" and args.tie_word_embeddings:
                return True
            if any(path.startswith(kp) for kp in kv_paths) and kv_rep > 1:
                tensor = self._replicate_kv_heads(tensor, kv_rep, args.head_dim)
            dt = leaf_dtype(path)
            # Regex groups give the leading indices: (layer,) for per-layer
            # tensors, (layer, expert) for MoE expert tensors; index_map
            # remaps them.
            idx = tuple(int(g) for g in m.groups() if g is not None)
            if index_map is not None:
                idx = index_map(idx)
                if idx is None:
                    return False
            ensure_buf(path, len(idx))
            if idx:
                bufs[path][idx] = tensor.astype(dt, copy=False)
                filled[path][idx] = True
            else:
                bufs[path][...] = tensor.astype(dt, copy=False)
                filled[path][0] = True
            return True

        unmatched = []
        for wf in self.weight_files:
            with safe_open(wf, framework="numpy") as f:
                for name in f.keys():
                    matched_any = any(rx.match(name) for rx, *_ in compiled)
                    if not matched_any:
                        unmatched.append(name)
                    raw = None
                    for rx, path, transpose, transform, index_map in compiled:
                        m = rx.match(name)
                        if m is None:
                            continue
                        if raw is None:
                            raw = f.get_tensor(name)
                        tensor = raw.T if transpose else raw
                        if transform is not None:
                            tensor = transform(tensor)
                        if isinstance(path, (tuple, list)):
                            # Fused checkpoint tensor (e.g. gpt2 c_attn) →
                            # split equally along the output dim.
                            pieces = np.split(tensor, len(path), axis=-1)
                            accepted = True
                            for sub_path, piece in zip(path, pieces):
                                accepted = store(sub_path, m, piece, index_map) and accepted
                        else:
                            accepted = store(path, m, tensor, index_map)
                        if accepted:
                            break  # first ACCEPTING rule wins

        if unmatched:
            logger.warning(
                "%d checkpoint tensors matched no weight rule (e.g. %s)",
                len(unmatched),
                ", ".join(unmatched[:5]),
            )
        # Synthetic (non-checkpoint) params: int8-KV per-layer scales default
        # to ModelArgs.kv_scale; calibration overwrites them post-load
        # (eval/kv_calibration.py).
        if "layers" in shapes and "kv_scales" in shapes.get("layers", {}):
            kv_shape = shapes["layers"]["kv_scales"]
            scales = np.full(kv_shape, args.kv_scale, np.float32)
            # Calibrated per-layer scales sidecar (eval/kv_calibration.py).
            sidecar = os.path.join(self.model_path, "kv_scales.json")
            if os.path.exists(sidecar):
                with open(sidecar) as f:
                    data = json.load(f)
                scales = np.stack(
                    [np.asarray(data["k"]), np.asarray(data["v"])], axis=1
                ).astype(np.float32)
                assert scales.shape == tuple(kv_shape), (scales.shape, kv_shape)
                logger.info("loaded calibrated kv scales from %s", sidecar)
            bufs.setdefault("layers.kv_scales", scales)
            filled["layers.kv_scales"] = np.ones(kv_shape[:1], dtype=bool)

        if verify:
            expected = _leaf_paths(shapes)
            missing = [
                p
                for p in expected
                if p not in filled or not filled[p].all()
            ]
            if missing:
                raise ValueError(f"weights not fully loaded for: {missing}")

        # Rebuild the nested pytree.
        params: Dict[str, Any] = {}
        for path, arr in bufs.items():
            node = params
            parts = path.split(".")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = arr
        if hasattr(model, "fuse_params"):
            params = model.fuse_params(params)
        return params

    def _zero_params(self, model) -> Dict[str, Any]:
        """Zero params matching load_param_shapes, run through fuse_params —
        the synthetic-weights path for serving benchmarks."""
        import ml_dtypes

        args = self.model_args
        np_dtype = {
            "bfloat16": ml_dtypes.bfloat16,
            "float16": np.float16,
            "float32": np.float32,
        }[args.dtype]

        def zero(name, shape):
            if name in ("qweight", "zeros"):
                return np.zeros(shape, np.int8)
            if name == "scales":
                # Must mirror leaf_dtype above: fake-load benches compile
                # the same kernel config (block_k alignment depends on
                # scales itemsize) as real checkpoint loads.
                return np.zeros(shape, np.float32)
            if name in ("g_idx", "perm"):
                return np.zeros(shape, np.int32)
            if name == "kv_scales":
                return np.full(shape, args.kv_scale, np.float32)
            return np.zeros(shape, np_dtype)

        def build(node):
            return {
                k: build(v) if isinstance(v, dict) else zero(k, v)
                for k, v in node.items()
            }

        shapes = (
            model.load_param_shapes()
            if hasattr(model, "load_param_shapes")
            else model.param_shapes()
        )
        params = build(shapes)
        if hasattr(model, "fuse_params"):
            params = model.fuse_params(params)
        return params

    @staticmethod
    def _replicate_kv_heads(tensor: np.ndarray, rep: int, head_dim: int) -> np.ndarray:
        """Repeat each kv head `rep` times along the head dim so contiguous
        tp slices each get a full copy (reference: qkv_parallel_linear.h:17)."""
        if tensor.ndim == 1:  # bias [Hkv*Dh]
            heads = tensor.reshape(-1, head_dim)
            return np.repeat(heads, rep, axis=0).reshape(-1)
        # weight [D, Hkv*Dh]
        d = tensor.shape[0]
        heads = tensor.reshape(d, -1, head_dim)
        return np.repeat(heads, rep, axis=1).reshape(d, -1)


def _leaf_paths(shapes: Dict[str, Any], prefix: str = "") -> List[str]:
    out = []
    for k, v in shapes.items():
        p = f"{prefix}{k}"
        if isinstance(v, dict):
            out.extend(_leaf_paths(v, p + "."))
        else:
            out.append(p)
    return out
