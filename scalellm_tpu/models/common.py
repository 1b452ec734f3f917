"""Generic decoder-only transformer core.

Where the reference defines one C++ header per model family
(reference: src/models/meta/llama.h:331, google/gemma2.h:381,
alibaba/qwen2.h:350, microsoft/phi.h:311 — each ~350 LoC of near-identical
module wiring), the TPU-native design is a single data-driven decoder whose
behavior is fully determined by ModelArgs. Per-model files only provide the
HF config loader, weight-name mapping, and chat template.

Design notes (TPU-first):
  - Params are a plain pytree with per-layer tensors STACKED along axis 0 so
    the layer loop is a single `lax.scan` — one compiled layer body instead
    of n_layers inlined copies (fast compiles, small HLO).
  - KV caches [n_layers, pages, page_size, n_kv_heads, head_dim] ride the
    scan as xs/ys and are donated by the caller, so XLA updates them in
    place.
  - Collectives (tensor parallelism) are explicit psum/all_gather guarded by
    ParallelConfig.tp_axis; the executor wraps forward in shard_map. Weight
    tensors arrive pre-sliced by shard_map's in_specs — the code below only
    ever sees local shapes (Megatron-style, like the reference's
    Column/RowParallelLinear, src/layers/linear/parallel_linear.h:42,81).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from scalellm_tpu.config import ModelArgs
from scalellm_tpu.engine.params import ModelInputs
from scalellm_tpu.layers.activations import ACT2FN, act_with_mul
from scalellm_tpu.layers.norms import layer_norm, rms_norm
from scalellm_tpu.layers.rope import apply_rope, compute_cos_sin
from scalellm_tpu.ops.attention import kv_layout, ragged_paged_attention
from scalellm_tpu.ops.kv_update import set_kv_cache
from scalellm_tpu.parallel.config import ParallelConfig


def _dtype_of(args: ModelArgs):
    # float16 checkpoints run as bfloat16: the TPU compute path (MXU, Mosaic
    # kernels) has no fp16 support, and bf16's range supersets fp16's.
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.bfloat16}[
        args.dtype
    ]


class DecoderModel:
    """A causal LM: embedding → scan(decoder layer) → norm → lm_head.

    The TPU-native CausalLM (reference interface: src/models/causal_lm.h:18).
    """

    def __init__(
        self,
        args: ModelArgs,
        parallel: ParallelConfig = ParallelConfig(),
        attn_impl=None,
    ):
        self.args = args
        self.parallel = parallel
        self.attn_impl = attn_impl or ragged_paged_attention
        tp = parallel.tp_size
        assert args.n_heads % tp == 0, "n_heads must divide tp_size"
        # KV heads replicate when n_kv_heads < tp (reference:
        # qkv_parallel_linear.h:17 kv-head replication logic).
        self.n_local_heads = args.n_heads // tp
        self.kv_replication = max(1, tp // args.n_kv_heads)
        self.n_local_kv_heads = max(1, args.n_kv_heads // tp)
        assert args.intermediate_size % tp == 0
        # KV page head layout: the TPU kernel needs lane-aligned (128x)
        # head dims. Heads are packed kv_pack-per-stored-row when they fit
        # exactly (head_dim 64 -> pairs), else zero-padded (see
        # ops/attention.py kv_layout).
        self.kv_stored_heads, self.kv_head_dim, self.kv_pack = kv_layout(
            self.n_local_kv_heads, args.head_dim
        )
        # int8 KV cache: halves KV HBM + bandwidth; pages dequantized by the
        # attention kernel's static k/v scales (see PAPERS.md kv-quant line).
        self.kv_quant = args.kv_cache_dtype == "int8"
        # Weight-only quantization of the 7 projection matrices
        # (reference: QLinearImpl selection by QuantArgs, quant_args.h:10-33).
        self.quant = args.quant_args if (args.quant_args and args.quant_args.enabled) else None
        if self.quant:
            assert self.quant.bits in (4, 8), self.quant.bits
        # GPTQ desc_act (activation-order groups): rows are re-sorted into
        # contiguous groups at load and the input is gathered by the row
        # permutation at runtime. Projections can't be fused then (each
        # sub-projection has its own row order — same constraint as the
        # reference, quant_args.h:31 can_be_fused), and the input gather
        # is incompatible with row-parallel TP sharding.
        self.desc_act = bool(self.quant and self.quant.desc_act)
        if self.desc_act:
            assert tp == 1, "GPTQ desc_act requires tp_size == 1"
        # MoE expert parallelism: shard the EXPERT dim over the tp axis when
        # it divides evenly (each shard computes only its experts — see
        # layers/moe.py); falls back to sharding the expert FFN dim.
        self.moe_expert_sharded = (
            args.n_experts > 0 and tp > 1 and args.n_experts % tp == 0
        )
        # Multi-LoRA (lora/loader.py): set by the engine after loading
        # adapters; param dicts then carry stacked lora_<target> entries and
        # ModelInputs.lora_ids selects the per-sequence adapter slot.
        self.lora_meta = None

    # ------------------------------------------------------------ param spec

    def load_param_shapes(self) -> Dict[str, Any]:
        """UNFUSED global shapes — the checkpoint-facing layout the loader
        fills (reference: per-tensor load_state_dict). fuse_params() folds
        q/k/v and gate/up into the fused layout of param_shapes()."""
        a = self.args
        L, D, V, F = a.n_layers, a.hidden_size, a.vocab_size, a.intermediate_size
        H, Dh = a.n_heads, a.head_dim
        Hkv = self.n_local_kv_heads * self.parallel.tp_size  # replication-padded
        def proj(k_dim, n_dim):
            """Dense (L, K, N) or the quantized triple for one projection."""
            if self.quant is None:
                return (L, k_dim, n_dim)
            g = self.quant.group_size if self.quant.group_size > 0 else k_dim
            pack = 2 if self.quant.bits == 4 else 1
            triple = {
                "qweight": (L, k_dim // pack, n_dim),
                "scales": (L, k_dim // g, n_dim),
                "zeros": (L, k_dim // g, n_dim),
            }
            if self.desc_act:
                triple["g_idx"] = (L, k_dim)
            return triple

        layers: Dict[str, Any] = {
            "input_norm": (L, D),
            "q_proj": proj(D, H * Dh),
            "k_proj": proj(D, Hkv * Dh),
            "v_proj": proj(D, Hkv * Dh),
            "o_proj": proj(H * Dh, D),
        }
        if a.n_experts > 0:
            E, Fm = a.n_experts, a.moe_intermediate_size
            layers["router"] = (L, D, E)
            G = (self.quant.group_size or 128) if self.quant else 0
            if (
                self.quant is not None
                and self.quant.quant_method == "internal"
                and self.quant.bits == 4
                and D % G == 0 and Fm % G == 0
            ):
                # Runtime int4-g128 experts (ops/moe_quant.py): packed
                # nibbles + per-(expert, k-group, channel) grids; the
                # decode path streams only the ROUTED experts' blocks.
                layers["moe_gate"] = {"qweight": (L, E, D // 2, Fm),
                                      "scales": (L, E, D // G, Fm)}
                layers["moe_up"] = {"qweight": (L, E, D // 2, Fm),
                                    "scales": (L, E, D // G, Fm)}
                layers["moe_down"] = {"qweight": (L, E, Fm // 2, D),
                                      "scales": (L, E, Fm // G, D)}
            elif (
                self.quant is not None
                and self.quant.quant_method == "internal"
            ):
                # Runtime int8 experts: per-(expert, out-channel) scales.
                layers["moe_gate"] = {"qweight": (L, E, D, Fm),
                                      "scales": (L, E, Fm)}
                layers["moe_up"] = {"qweight": (L, E, D, Fm),
                                    "scales": (L, E, Fm)}
                layers["moe_down"] = {"qweight": (L, E, Fm, D),
                                      "scales": (L, E, D)}
            else:
                layers["moe_gate"] = (L, E, D, Fm)
                layers["moe_up"] = (L, E, D, Fm)
                layers["moe_down"] = (L, E, Fm, D)
            if a.moe_shared_intermediate > 0:
                Fs = a.moe_shared_intermediate
                layers["up_proj"] = proj(D, Fs)
                layers["down_proj"] = proj(Fs, D)
                if a.mlp_gated:
                    layers["gate_proj"] = proj(D, Fs)
                layers["shared_gate"] = (L, D, 1)
        else:
            layers["up_proj"] = proj(D, F)
            layers["down_proj"] = proj(F, D)
            if a.mlp_gated:
                layers["gate_proj"] = proj(D, F)
        if not a.parallel_residual:
            layers["post_norm"] = (L, D)
        if a.residual_post_layernorm:
            layers["post_attn_norm"] = (L, D)
            layers["post_ffw_norm"] = (L, D)
        if a.qkv_bias:
            layers["q_bias"] = (L, H * Dh)
            layers["k_bias"] = (L, Hkv * Dh)
            layers["v_bias"] = (L, Hkv * Dh)
        if a.o_proj_bias:
            layers["o_bias"] = (L, D)
        if a.mlp_bias:
            layers["up_bias"] = (L, F)
            layers["down_bias"] = (L, D)
            if a.mlp_gated:
                layers["gate_bias"] = (L, F)
        if a.norm_bias:
            layers["input_norm_bias"] = (L, D)
            if not a.parallel_residual:
                layers["post_norm_bias"] = (L, D)
        if a.use_qk_norm:
            layers["q_norm"] = (L, Dh)
            layers["k_norm"] = (L, Dh)
        if self.kv_quant:
            # Per-layer [k_scale, v_scale] for the int8 KV cache — filled by
            # calibration (eval/kv_calibration.py) or ModelArgs.kv_scale.
            layers["kv_scales"] = (L, 2)
        shapes = {
            "embed_tokens": (V, D),
            "layers": layers,
            "final_norm": (D,),
        }
        if a.norm_bias:
            shapes["final_norm_bias"] = (D,)
        if a.embedding_norm:
            # bloom: word_embeddings_layernorm applied to the embedding
            # output (reference: _deprecated/bloom.h BloomModelImpl).
            shapes["embed_norm"] = (D,)
            if a.norm_bias:
                shapes["embed_norm_bias"] = (D,)
        if a.pos_embedding_type == "learned":
            shapes["embed_positions"] = (a.max_position_embeddings, D)
        if not a.tie_word_embeddings:
            if self._lm_head_quant():
                g = 128
                pack = 2 if self._lm_head_bits() == 4 else 1
                shapes["lm_head"] = {
                    "qweight": (D // pack, V),
                    "scales": (D // g, V),
                    "zeros": (D // g, V),
                }
            else:
                shapes["lm_head"] = (D, V)
            if a.lm_head_bias:
                shapes["lm_head_bias"] = (V,)
        return shapes

    def _lm_head_quant(self) -> bool:
        return bool(
            self.quant
            and getattr(self.quant, "quantize_lm_head", False)
            and self.args.hidden_size % 128 == 0
        )

    def _lm_head_bits(self) -> int:
        """quantize_lm_head: truthy → int8; the string "int4" halves the
        biggest single decode-step HBM read again (b=1: lm_head is ~13% of
        the 8B INT4 step)."""
        opt = getattr(self.quant, "quantize_lm_head", False)
        return 4 if opt == "int4" else 8

    def _tile_n(self, n_local: int, lm_head: bool = False) -> int:
        """Stored quant tile width for a LOCAL (per-shard) output width —
        the largest power-of-two ≤ the default dividing nothing in
        particular: widths are simply padded up to a tile multiple.
        Env QUANT_TILE_N overrides for sweeps (takes effect at param
        creation/load time — the width is baked into the stored layout)."""
        import os

        from scalellm_tpu.ops.quant_matmul import DEFAULT_TILE_N

        w = int(os.environ.get("QUANT_TILE_N", 0)) or DEFAULT_TILE_N
        if lm_head:
            # The int8 lm_head is the single biggest quant matmul (N =
            # vocab); fewer, wider tiles win there (swept on v5e 8B:
            # W=2048 +0.4% over 1024 — 63 vs 126 grid cells).
            w = int(os.environ.get("QUANT_TILE_N_LMHEAD", 0)) or 2048
        return min(w, n_local)

    def _tiled_shape(self, triple: Dict[str, Tuple], tp_sharded: bool,
                     lm_head: bool = False) -> Dict[str, Tuple]:
        """Flat quant triple shapes (L, R, N) → tiled (L, n_n, R, W). For
        column-parallel (tp_sharded) params, each shard's chunk is tiled and
        padded independently so PartitionSpec over the tile dim shards
        cleanly."""
        tp = self.parallel.tp_size if tp_sharded else 1
        L, Rq, N = triple["qweight"]
        n_local = N // tp
        W = self._tile_n(n_local, lm_head)
        n_tiles_local = -(-n_local // W)  # ceil
        n_n = n_tiles_local * tp
        out = {}
        for key, shape in triple.items():
            if len(shape) != 3:  # e.g. desc_act "perm" (L, K): not tiled
                out[key] = shape
                continue
            l, r, _ = shape
            out[key] = (l, n_n, r, W)
        return out

    def param_shapes(self) -> Dict[str, Any]:
        """Runtime (fused) global shapes: q/k/v fused into qkv_proj and
        gate/up into gate_up_proj (reference: qkv_parallel_linear.h:17,
        multi_parallel_linear.h:73) — one projection launch instead of
        three/two on the per-layer critical path. Quantized projections are
        stored in the N-TILED layout (ops/quant_matmul.py tile_quant_layout)
        so kernel grid cells read contiguous HBM blocks."""
        a = self.args
        shapes = self.load_param_shapes()
        layers = shapes["layers"]
        L, D = a.n_layers, a.hidden_size
        H, Dh = a.n_heads, a.head_dim
        Hkv = self.n_local_kv_heads * self.parallel.tp_size
        fused_n = (H + 2 * Hkv) * Dh

        def fuse_proj(paths, n_total):
            first = layers[paths[0]]
            for pth in paths:
                del layers[pth]
            if isinstance(first, dict):
                return {
                    "qweight": (L, first["qweight"][1], n_total),
                    "scales": (L, first["scales"][1], n_total),
                    "zeros": (L, first["zeros"][1], n_total),
                }
            return (L, first[1], n_total)

        if self.desc_act:
            # No fusion (per-projection row orders differ); g_idx becomes
            # the runtime input-gather permutation.
            for node in layers.values():
                if isinstance(node, dict) and "g_idx" in node:
                    node["perm"] = node.pop("g_idx")
        else:
            layers["qkv_proj"] = fuse_proj(["q_proj", "k_proj", "v_proj"], fused_n)
            if a.qkv_bias:
                for pth in ("q_bias", "k_bias", "v_bias"):
                    del layers[pth]
                layers["qkv_bias"] = (L, fused_n)
            if a.mlp_gated and "gate_proj" in layers:
                F = layers["up_proj"][2] if not isinstance(layers["up_proj"], dict) else layers["up_proj"]["qweight"][2]
                layers["gate_up_proj"] = fuse_proj(["gate_proj", "up_proj"], 2 * F)
                if a.mlp_bias:
                    del layers["gate_bias"], layers["up_bias"]
                    layers["gate_up_bias"] = (L, 2 * F)
        # Tile every quant triple (fused or not) for contiguous kernel reads.
        if self.quant is not None:
            col_parallel = {
                "qkv_proj", "gate_up_proj", "up_proj",
                "q_proj", "k_proj", "v_proj", "gate_proj",
            }
            for name, node in list(layers.items()):
                if (
                    isinstance(node, dict)
                    and "qweight" in node
                    and "zeros" in node  # expert pairs keep [L,E,K,N] layout
                ):
                    layers[name] = self._tiled_shape(node, name in col_parallel)
        if self._lm_head_quant() and "lm_head" in shapes:
            shapes["lm_head"] = self._tiled_shape(
                {k: (1,) + v for k, v in shapes["lm_head"].items()}, True,
                lm_head=True,
            )
            shapes["lm_head"] = {
                k: v[1:] for k, v in shapes["lm_head"].items()
            }
        return shapes

    def fuse_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Concatenate q/k/v (and gate/up) host arrays into the fused layout,
        interleaved per tp shard so each shard's slice is [q_s|k_s|v_s]
        (Megatron fused-qkv layout; reference: qkv weight loading slices)."""
        import numpy as np

        a = self.args
        layers = params["layers"]
        tp = self.parallel.tp_size

        def interleave(parts):
            """parts: list of arrays with the fused dim LAST; concat per-shard."""
            if tp == 1:
                cat = np.concatenate
                return cat(parts, axis=-1)
            shards = []
            for s_i in range(tp):
                for part in parts:
                    n = part.shape[-1] // tp
                    shards.append(part[..., s_i * n : (s_i + 1) * n])
            return np.concatenate(shards, axis=-1)

        def fuse(paths, out_name):
            vals = [layers.pop(p) for p in paths]
            if isinstance(vals[0], dict):
                layers[out_name] = {
                    k: interleave([v[k] for v in vals]) for k in vals[0]
                }
            else:
                layers[out_name] = interleave(vals)

        if self._lm_head_quant() and "lm_head" in params:
            from scalellm_tpu.ops.quant_matmul import quantize_int4, quantize_int8

            lm = np.asarray(params["lm_head"], dtype=np.float32)
            if self._lm_head_bits() == 4:
                qw, sc, zp = quantize_int4(lm, 128)
            else:
                qw, sc, zp = quantize_int8(lm, 128)
            params["lm_head"] = {"qweight": qw, "scales": sc, "zeros": zp}
        if self.desc_act:
            self._sort_desc_act_rows(layers)
        else:
            fuse(["q_proj", "k_proj", "v_proj"], "qkv_proj")
            if a.qkv_bias:
                fuse(["q_bias", "k_bias", "v_bias"], "qkv_bias")
            if a.mlp_gated and "gate_proj" in layers:
                fuse(["gate_proj", "up_proj"], "gate_up_proj")
                if a.mlp_bias:
                    fuse(["gate_bias", "up_bias"], "gate_up_bias")
        # Tile quant triples into the contiguous-read layout (per-shard
        # padding for column-parallel params so tile-dim sharding is clean).
        self.tile_quant_params(params)
        return params

    def _sort_desc_act_rows(self, layers: Dict[str, Any]) -> None:
        """GPTQ desc_act: per layer, sort weight ROWS into contiguous group
        order (perm = stable argsort of g_idx) so the grouped kernel's
        scales line up; keep perm for the runtime input gather
        (x[:, perm] @ W_sorted == x @ W)."""
        import numpy as np

        from scalellm_tpu.ops.quant_matmul import pack_int4, unpack_int4

        for name, node in layers.items():
            if not (isinstance(node, dict) and "g_idx" in node):
                continue
            g_idx = np.asarray(node.pop("g_idx"))  # [L, K]
            L = g_idx.shape[0]
            perms = np.stack(
                [np.argsort(g_idx[l], kind="stable") for l in range(L)]
            ).astype(np.int32)
            qw = np.asarray(node["qweight"])  # [L, K/2, N] packed
            sorted_q = np.stack([
                pack_int4(unpack_int4(qw[l])[perms[l]]) for l in range(L)
            ])
            node["qweight"] = sorted_q
            node["perm"] = perms

    def tile_quant_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """In-place: convert every flat quant triple (layers + lm_head) in a
        FUSED host param tree to the N-tiled layout of param_shapes()."""
        import numpy as np

        if self.quant is None:
            return params
        from scalellm_tpu.ops.quant_matmul import tile_quant_layout

        tp = self.parallel.tp_size
        col_parallel = {"qkv_proj", "gate_up_proj", "up_proj"}

        def tile_triple(triple, tp_sharded, lm_head=False):
            tp_n = tp if tp_sharded else 1
            W = self._tile_n(triple["qweight"].shape[-1] // tp_n, lm_head)
            out = {}
            for key, arr in triple.items():
                if key == "perm":  # desc_act input gather: stays [L, K]
                    out[key] = arr
                elif tp_n == 1:
                    out[key] = tile_quant_layout(arr, W)
                else:
                    chunks = np.split(arr, tp_n, axis=-1)
                    out[key] = np.concatenate(
                        [tile_quant_layout(c, W) for c in chunks],
                        axis=-3,
                    )
            return out

        col_parallel |= {
            "q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"
        }
        layers = params["layers"]
        for name, node in list(layers.items()):
            if isinstance(node, dict) and "qweight" in node:
                if np.asarray(node["qweight"]).ndim == 4:
                    continue  # already tiled
                layers[name] = tile_triple(node, name in col_parallel)
        lm = params.get("lm_head")
        if isinstance(lm, dict) and np.asarray(lm["qweight"]).ndim == 2:
            params["lm_head"] = tile_triple(lm, True, lm_head=True)
        return params

    def param_partition_specs(self) -> Dict[str, Any]:
        """PartitionSpec per param for the tp mesh axis (Megatron layout):
        qkv/gate/up column-parallel (output dim sharded), o/down row-parallel
        (input dim sharded, psum after), norms/embeddings replicated."""
        tp = self.parallel.tp_axis
        a = self.args
        def proj_spec(row_parallel: bool):
            """Column-parallel shards the N dim; row-parallel shards the K
            dim. Quantized params are N-TILED (L, n_n, R, W): column-parallel
            shards the tile dim (per-shard tiles are stored consecutively),
            row-parallel shards the R (K-rows) dim of qweight AND of the
            per-group scales/zeros."""
            if self.quant is None:
                return P(None, tp, None) if row_parallel else P(None, None, tp)
            spec = P(None, None, tp, None) if row_parallel else P(None, tp, None, None)
            d = {"qweight": spec, "scales": spec, "zeros": spec}
            if self.desc_act:
                d["perm"] = P(None, None)
            return d

        layers: Dict[str, Any] = {
            "input_norm": P(None, None),
            "o_proj": proj_spec(True),  # row-parallel
        }
        if self.desc_act:  # unfused (tp == 1, everything replicated)
            for n in ("q_proj", "k_proj", "v_proj"):
                layers[n] = proj_spec(False)
        else:
            layers["qkv_proj"] = proj_spec(False)  # column-parallel
        def mlp_specs():
            layers["down_proj"] = proj_spec(True)
            if a.mlp_gated:
                if self.desc_act:
                    layers["gate_proj"] = proj_spec(False)
                    layers["up_proj"] = proj_spec(False)
                else:
                    layers["gate_up_proj"] = proj_spec(False)
                if a.mlp_bias and not self.desc_act:
                    layers["gate_up_bias"] = P(None, tp)
                elif a.mlp_bias:
                    layers["gate_bias"] = P(None, tp)
                    layers["up_bias"] = P(None, tp)
            else:
                layers["up_proj"] = proj_spec(False)
                if a.mlp_bias:
                    layers["up_bias"] = P(None, tp)
            if a.mlp_bias:
                layers["down_bias"] = P(None, None)

        if a.n_experts > 0:
            layers["router"] = P(None, None, None)
            moe_quant = (
                self.quant is not None
                and self.quant.quant_method == "internal"
            )
            if moe_quant:
                # Quantized experts shard over the expert dim only (EP
                # when tp divides E; replicated otherwise — the
                # routed-only decode kernel reads k/E of the bytes).
                ep = tp if self.moe_expert_sharded else None
                sc_tail = (
                    (None, None) if self.quant.bits == 4 else (None,)
                )
                qspec = {
                    "qweight": P(None, ep, None, None),
                    "scales": P(None, ep, *sc_tail),
                }
                layers["moe_gate"] = dict(qspec)
                layers["moe_up"] = dict(qspec)
                layers["moe_down"] = dict(qspec)
            elif self.moe_expert_sharded:
                # expert-parallel: experts sharded, FFN dims full
                layers["moe_gate"] = P(None, tp, None, None)
                layers["moe_up"] = P(None, tp, None, None)
                layers["moe_down"] = P(None, tp, None, None)
            else:
                # expert FFN dim sharded (column for gate/up, row for down)
                layers["moe_gate"] = P(None, None, None, tp)
                layers["moe_up"] = P(None, None, None, tp)
                layers["moe_down"] = P(None, None, tp, None)
            if a.moe_shared_intermediate > 0:
                mlp_specs()
                layers["shared_gate"] = P(None, None, None)
        else:
            mlp_specs()
        if not a.parallel_residual:
            layers["post_norm"] = P(None, None)
        if a.residual_post_layernorm:
            layers["post_attn_norm"] = P(None, None)
            layers["post_ffw_norm"] = P(None, None)
        if a.qkv_bias:
            if self.desc_act:
                for n in ("q_bias", "k_bias", "v_bias"):
                    layers[n] = P(None, tp)
            else:
                layers["qkv_bias"] = P(None, tp)
        if a.o_proj_bias:
            layers["o_bias"] = P(None, None)  # row-parallel bias: replicated
        if a.norm_bias:
            layers["input_norm_bias"] = P(None, None)
            if not a.parallel_residual:
                layers["post_norm_bias"] = P(None, None)
        if a.use_qk_norm:
            layers["q_norm"] = P(None, None)
            layers["k_norm"] = P(None, None)
        if self.kv_quant:
            layers["kv_scales"] = P(None, None)
        if self.lora_meta is not None:
            # LoRA requires tp_size == 1 (loader enforces); A/B replicated
            # across any remaining (dp) mesh axes.
            for t in self.lora_meta.targets:
                layers[f"lora_{t}"] = (P(None, None, None, None),) * 2
        # Vocab-parallel embedding (reference: VocabParallelEmbeddingImpl,
        # embedding.h:101): the table shards over the vocab dim — on a 70B
        # class model a replicated table wastes ~2 GB/chip at tp=16. The
        # lookup masks out-of-shard ids and psums (forward()); replicated
        # only when vocab doesn't divide tp.
        vocab_sharded = (
            tp is not None and a.vocab_size % max(self.parallel.tp_size, 1) == 0
        )
        specs = {
            "embed_tokens": P(tp, None) if vocab_sharded else P(None, None),
            "layers": layers,
            "final_norm": P(None),
        }
        if a.norm_bias:
            specs["final_norm_bias"] = P(None)
        if a.embedding_norm:
            specs["embed_norm"] = P(None)
            if a.norm_bias:
                specs["embed_norm_bias"] = P(None)
        if a.pos_embedding_type == "learned":
            specs["embed_positions"] = P(None, None)
        if not a.tie_word_embeddings:
            if self._lm_head_quant():
                # tiled (n_n, R, W): vocab tiles sharded over tp
                lm_spec = P(tp, None, None)
                specs["lm_head"] = {
                    "qweight": lm_spec,
                    "scales": lm_spec,
                    "zeros": lm_spec,
                }
            else:
                specs["lm_head"] = P(None, tp)  # vocab-sharded, all-gathered
            if a.lm_head_bias:
                specs["lm_head_bias"] = P(tp)
        return specs

    def kv_cache_shape(self, num_pages: int, page_size: int) -> Tuple[int, ...]:
        """GLOBAL combined kv cache shape (K/V interleaved on the head dim,
        K even / V odd; that dim is sharded over tp)."""
        a = self.args
        Hkv = self.kv_stored_heads * self.parallel.tp_size
        return (a.n_layers, num_pages, page_size, 2 * Hkv, self.kv_head_dim)

    def kv_cache_partition_spec(self) -> P:
        return P(None, None, None, self.parallel.tp_axis, None)

    def init_params(self, rng_key, scale: float = 0.02) -> Dict[str, Any]:
        """Random params (tests / memory profiling / synthetic benchmarks)."""
        dtype = _dtype_of(self.args)

        def init_leaf(path, path_shape, key):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name == "qweight":
                return jax.random.randint(key, path_shape, -128, 127, dtype=jnp.int8)
            if name == "zeros":
                return jnp.zeros(path_shape, dtype=jnp.int8)
            if name == "scales":
                from scalellm_tpu.ops.quant_matmul import scales_np_dtype

                return jnp.full(
                    path_shape, scale / 8.0, dtype=jnp.dtype(scales_np_dtype())
                )
            if name == "kv_scales":
                return jnp.full(path_shape, self.args.kv_scale, dtype=jnp.float32)
            if name == "perm":
                return jnp.broadcast_to(
                    jnp.arange(path_shape[-1], dtype=jnp.int32), path_shape
                )
            return (
                jax.random.normal(key, path_shape, dtype=jnp.float32) * scale
            ).astype(dtype)

        shapes = self.param_shapes()
        paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(
            shapes, is_leaf=lambda x: isinstance(x, tuple)
        )
        keys = jax.random.split(rng_key, len(paths_leaves))
        params = jax.tree_util.tree_unflatten(
            treedef,
            [init_leaf(p, s, k) for (p, s), k in zip(paths_leaves, keys)],
        )
        # Norm weights should start at 1 (or 0 for zero-centered).
        one = 0.0 if self.args.zero_centered_norm else 1.0
        for name in list(params["layers"]):
            if name.endswith("_norm"):
                params["layers"][name] = jnp.full_like(params["layers"][name], one)
        params["final_norm"] = jnp.full_like(params["final_norm"], one)
        if "embed_norm" in params:
            params["embed_norm"] = jnp.full_like(params["embed_norm"], one)
        return params

    # ------------------------------------------------------------ forward

    def _norm(self, x, w, b=None):
        a = self.args
        if a.norm_type == "rms_norm":
            return rms_norm(x, w, a.rms_norm_eps, a.zero_centered_norm)
        return layer_norm(x, w, b, a.layer_norm_eps)

    def _proj(self, x, w, rms=None):
        """x @ W for a dense or quantized projection, f32 result
        (quantized: fused dequant+matmul Pallas kernel, ops/quant_matmul.py —
        the reference's QLinearImpl dispatch, qlinear_*_impl.h).

        rms=(gamma, eps) fuses the preceding RMSNorm into the kernel's
        prologue (decode: one fewer XLA launch + HBM round trip per
        projection); callers must then pass the UN-normed input."""
        if isinstance(w, dict):
            from scalellm_tpu.ops.quant_matmul import quant_matmul

            if "perm" in w:
                # desc_act: rows were sorted into contiguous groups at load;
                # gather the input by the same permutation.
                x = jnp.take(x, w["perm"], axis=1)
            # Symmetric checkpoints (GPTQ sym / internal quantizer) skip the
            # zero-point load + correction entirely in the kernel.
            sym = bool(self.quant.is_sym and not self.quant.zero_point)
            out = quant_matmul(
                x,
                w["qweight"],
                w["scales"],
                w["zeros"],
                bits=self.quant.bits,
                symmetric=sym,
                # Layer-stacked [L, ...] triple inside the scan: the kernel
                # streams layer __layer__'s tiles straight from the stacked
                # HBM array (see forward()'s quant_stream).
                layer=w.get("__layer__"),
                rms_gamma=rms[0] if rms is not None else None,
                rms_eps=float(rms[1]) if rms is not None else 1e-6,
            )
            return out.astype(jnp.float32)
        if rms is not None:
            x = rms_norm(x, rms[0], rms[1])
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    def _sm_scale(self) -> float:
        a = self.args
        if a.attn_scalar is not None:
            return a.attn_scalar
        if a.query_pre_attn_scalar > 0:
            return a.query_pre_attn_scalar ** -0.5
        return a.head_dim ** -0.5

    def _layer_windows(self) -> Optional[jnp.ndarray]:
        """Per-layer sliding window sizes, or None when unused.

        gemma2-style: layers where (i % pattern != pattern-1) use the window
        (reference: gemma2 sliding-window alternation, model_args.h:125-127).
        """
        a = self.args
        if not a.sliding_window:
            return None
        pattern = max(a.sliding_window_pattern, 1)
        win = [
            a.sliding_window if (i % pattern != pattern - 1 or pattern == 1) else -1
            for i in range(a.n_layers)
        ]
        return jnp.asarray(win, dtype=jnp.int32)

    def forward(
        self,
        params: Dict[str, Any],
        kv_cache: jnp.ndarray,  # [L, P, page, 2*Hkv_local, Dh] (local shapes)
        mi: ModelInputs,
        all_hidden: bool = False,
        decode_only: bool = False,
    ):
        """Returns (hidden_selected [S, D], new_kv_cache); with
        all_hidden=True, the full [T, D] hidden states instead (callers
        gather — used by prompt-logprob scoring and the ppl harness).
        decode_only=True (STATIC) asserts every sequence contributes
        exactly one query token (row s of q = sequence s) and routes
        attention to the decode-specialized kernel."""
        a = self.args
        tp_axis = self.parallel.tp_axis
        H_local = self.n_local_heads
        Hkv_local = self.n_local_kv_heads
        Dh = a.head_dim
        sm_scale = self._sm_scale()

        # Sequence parallelism (ParallelConfig.sp): per-token work (embedding,
        # norms, residuals) runs on a T/tp token shard; activations gather to
        # full T only for the projections + attention. Static gate: dense
        # models, no LoRA, and the (static) T bucket must divide by tp.
        T_full = mi.token_ids.shape[0]
        sp = (
            self.parallel.sp
            and tp_axis is not None
            and a.n_experts == 0
            and self.lora_meta is None
            and T_full % self.parallel.tp_size == 0
        )
        if sp:
            Ts = T_full // self.parallel.tp_size
            sp_rank = lax.axis_index(tp_axis)
            tok_ids = lax.dynamic_slice_in_dim(mi.token_ids, sp_rank * Ts, Ts)
            pos_ids = lax.dynamic_slice_in_dim(mi.positions, sp_rank * Ts, Ts)
        else:
            tok_ids, pos_ids = mi.token_ids, mi.positions

        emb = params["embed_tokens"]
        if tp_axis is not None and emb.shape[0] != a.vocab_size:
            # Vocab-parallel table (local [V/tp, D] shard): each rank
            # gathers the ids that land in its shard (others masked to 0)
            # and one psum assembles the full rows (reference:
            # VocabParallelEmbeddingImpl::forward, embedding.h:121-135).
            # The psum requires IDENTICAL ids on every rank, so under sp
            # the lookup runs on the full T list and the token shard is
            # sliced afterwards.
            ids = mi.token_ids if sp else tok_ids
            v_local = emb.shape[0]
            off = lax.axis_index(tp_axis) * v_local
            loc = ids - off
            ok = jnp.logical_and(loc >= 0, loc < v_local)
            rows = emb[jnp.clip(loc, 0, v_local - 1)]
            h = lax.psum(jnp.where(ok[:, None], rows, 0), tp_axis)
            if sp:
                h = lax.dynamic_slice_in_dim(h, sp_rank * Ts, Ts)
        else:
            h = emb[tok_ids]  # [T, D] ([Ts, D] under sp)
        if a.normalize_embedding:
            h = (h.astype(jnp.float32) * math.sqrt(a.hidden_size)).astype(h.dtype)
        if a.embedding_norm:
            # bloom word_embeddings_layernorm (pre-decoder-stack norm)
            h = self._norm(h, params["embed_norm"], params.get("embed_norm_bias"))
        if a.pos_embedding_type == "learned":
            h = h + params["embed_positions"][pos_ids]

        if a.pos_embedding_type == "rope":
            cos, sin = compute_cos_sin(a, mi.positions)
        else:
            cos = sin = None
        windows = self._layer_windows()
        soft_cap = a.attn_logit_soft_cap if a.attn_logit_soft_cap > 0 else None

        # Multi-LoRA: one-hot adapter mask per token. The delta is computed
        # for every adapter slot on the tiny rank-r intermediate and masked
        # — A_slots * r / N ≈ a few % of the base matmul's FLOPs, with no
        # gather/scatter of weights (TPU-friendly dense einsums).
        lora_oh = None
        if self.lora_meta is not None and mi.lora_ids is not None:
            lora_t = mi.lora_ids[mi.token_seg]  # [T]
            lora_oh = jax.nn.one_hot(
                lora_t, self.lora_meta.n_slots, dtype=jnp.float32
            )

        def lora_add(y, lp, name, x):
            """y += per-token LoRA delta of projection `name` on input x."""
            ab = lp.get("lora_" + name) if lora_oh is not None else None
            if ab is None:
                return y
            A, B = ab  # [slots, K, r], [slots, r, N]
            za = jnp.einsum(
                "tk,akr->tar", x.astype(jnp.float32), A
            ) * lora_oh[:, :, None]
            return y + jnp.einsum("tar,arn->tn", za, B)
        if self.kv_pack > 1:
            # Owner slot of each q head inside its packed stored KV head:
            # q head h reads kv head (h // gqa_group), stored at slot
            # (kv_head % kv_pack) of stored head (kv_head // kv_pack) — the
            # latter matching the kernel's h // (gqa_group * kv_pack) map.
            gqa_group = H_local // Hkv_local
            q_slot = jnp.asarray(
                [(h // gqa_group) % self.kv_pack for h in range(H_local)],
                jnp.int32,
            )

        # ALiBi (mpt/bloom class): per-head score-bias slopes instead of
        # position embeddings (reference: mask.h + handler.cpp
        # create_handler_with_alibi). Heads are column-sharded over tp, so
        # each rank slices its local heads' slopes.
        alibi = None
        if a.pos_embedding_type == "alibi":
            from scalellm_tpu.layers.alibi import alibi_slopes

            slopes_all = jnp.asarray(alibi_slopes(a.n_heads), jnp.float32)
            if tp_axis is not None:
                slopes_all = lax.dynamic_slice_in_dim(
                    slopes_all, lax.axis_index(tp_axis) * H_local, H_local
                )
            alibi = slopes_all
            if self.kv_pack > 1:
                # Packed stored heads reorder q heads by owner slot — the
                # kernel path is the jnp reference (no packing); keep 1:1.
                raise NotImplementedError(
                    "alibi with packed KV heads is unsupported"
                )

        def attend(q, kvc, window):
            # int8 KV: pages store round(x / s) with per-layer calibrated
            # scales (lp["kv_scales"]); the kernel only takes STATIC float
            # scales, so dequant is applied algebraically — q pre-scaled by
            # s_k (scores are linear in k) and the output post-scaled by s_v
            # — with the kernel's own scale pinned to 1.0.
            extra = {"alibi_slopes": alibi} if alibi is not None else {}
            return self.attn_impl(
                q,
                kvc,
                mi.kv_lens,
                mi.block_tables,
                mi.cu_q_lens,
                mi.num_seqs,
                sm_scale=sm_scale,
                sliding_window=window,
                logit_soft_cap=soft_cap,
                k_scale=1.0 if self.kv_quant else None,
                v_scale=1.0 if self.kv_quant else None,
                decode_only=decode_only,
                **extra,
            )

        def dense_ffn(lp, x, rms=None):
            """Gated/plain FFN, pre-psum partial result. Gated path uses the
            fused gate_up projection (one launch). rms=(gamma, eps) folds
            the post-attention RMSNorm into the gate_up kernel prologue
            (fused path only — callers gate on that)."""
            F = a.moe_shared_intermediate if a.n_experts > 0 else a.intermediate_size
            F_local = F // self.parallel.tp_size
            if a.mlp_gated and "gate_up_proj" not in lp:  # desc_act unfused
                g = self._proj(x, lp["gate_proj"])[:, :F_local]
                u = self._proj(x, lp["up_proj"])[:, :F_local]
                if a.mlp_bias:
                    g = g + lp["gate_bias"].astype(jnp.float32)
                    u = u + lp["up_bias"].astype(jnp.float32)
                g = lora_add(g, lp, "gate_proj", x)
                u = lora_add(u, lp, "up_proj", x)
                m = act_with_mul(a.hidden_act, g, u).astype(x.dtype)
            elif a.mlp_gated:
                gu = self._proj(x, lp["gate_up_proj"], rms=rms)
                if a.mlp_bias:
                    gu = gu[:, : 2 * F_local] + lp["gate_up_bias"].astype(jnp.float32)
                # explicit widths: tiled quant outputs may carry N padding
                g, u = gu[:, :F_local], gu[:, F_local : 2 * F_local]
                g = lora_add(g, lp, "gate_proj", x)
                u = lora_add(u, lp, "up_proj", x)
                m = act_with_mul(a.hidden_act, g, u).astype(x.dtype)
            else:
                u = self._proj(x, lp["up_proj"])[:, :F_local]
                if a.mlp_bias:
                    u = u + lp["up_bias"].astype(jnp.float32)
                u = lora_add(u, lp, "up_proj", x)
                m = ACT2FN[a.hidden_act](u).astype(x.dtype)
            d = self._proj(m, lp["down_proj"])[:, : a.hidden_size]
            return lora_add(d, lp, "down_proj", m)

        def sp_combine(y):
            """Row-parallel combine: plain TP psums (replicated result); SP
            reduce_scatters over the token dim (sharded result)."""
            if tp_axis is None:
                return y
            if sp:
                return lax.psum_scatter(
                    y, tp_axis, scatter_dimension=0, tiled=True
                )
            return lax.psum(y, tp_axis)

        def sp_gather(x):
            """Column-parallel input: SP gathers the token shard to full T."""
            if sp:
                return lax.all_gather(x, tp_axis, axis=0, tiled=True)
            return x

        def mlp(lp, x, rms=None):
            if a.n_experts > 0:
                from scalellm_tpu.layers.moe import moe_mlp

                m = moe_mlp(
                    x,
                    lp["router"],
                    lp["moe_gate"],
                    lp["moe_up"],
                    lp["moe_down"],
                    a.n_experts_per_token,
                    a.norm_topk_prob,
                    ACT2FN[a.hidden_act],
                    ep_axis=tp_axis if self.moe_expert_sharded else None,
                )
                if a.moe_shared_intermediate > 0:
                    gate = jax.nn.sigmoid(
                        jnp.dot(
                            x.astype(jnp.float32),
                            lp["shared_gate"].astype(jnp.float32),
                        )
                    )  # [T, 1]
                    m = m + dense_ffn(lp, x) * gate
                if tp_axis is not None:
                    m = lax.psum(m, tp_axis)
                return m
            m = dense_ffn(lp, x, rms=rms)
            m = sp_combine(m)
            if a.mlp_bias:
                # Row-parallel bias is added once, after the psum.
                m = m + lp["down_bias"].astype(jnp.float32)
            return m

        # Perf-decomposition ablations (bench.py BENCH_ABLATE=norm,rope,
        # scatter,attn,act — timing diagnostics only, outputs become wrong).
        import os as _os

        _ablate = set(
            (_os.environ.get("BENCH_ABLATE") or "").split(",")
        ) - {""}

        def layer_fn(carry, xs):
            h = carry
            if windows is None:
                lp, kvc, li = xs
                window_flag = None
            else:
                lp, kvc, li, window_flag = xs
            if quant_stream:
                # Re-attach the streamed (stacked) quant triples with this
                # layer's index; _proj passes it to the kernel.
                lp = dict(lp)
                for name, triple in quant_stream.items():
                    lp[name] = {**lp[name], **triple, "__layer__": li}

            # Fused-norm fast path: quantized fused projections with a
            # plain (bias-free) RMSNorm and no LoRA fold the norm into the
            # quant kernel's prologue — the un-normed h goes straight in.
            # (LoRA and parallel-residual need the normed x as a separate
            # value; desc_act permutes rows before the kernel.)
            def _rms_of(gamma):
                if a.zero_centered_norm:
                    gamma = 1.0 + gamma.astype(jnp.float32)
                return (gamma, a.rms_norm_eps)

            def _can_fuse(norm_key, bias_key, proj_key):
                return (
                    _os.environ.get("QUANT_FUSE_RMS", "1") != "0"
                    and self.quant is not None
                    and "norm" not in _ablate
                    and a.norm_type == "rms_norm"
                    and lp.get(bias_key) is None
                    and self.lora_meta is None
                    and not a.parallel_residual
                    and isinstance(lp.get(proj_key), dict)
                    and "perm" not in lp[proj_key]
                )

            # ---- attention (fused qkv: one projection launch)
            fuse_qkv_norm = _can_fuse(
                "input_norm", "input_norm_bias", "qkv_proj"
            )
            if "norm" in _ablate or fuse_qkv_norm:
                x = h
            else:
                x = self._norm(h, lp["input_norm"], lp.get("input_norm_bias"))
            x = sp_gather(x)  # SP: column-parallel qkv needs full T
            q_n = H_local * Dh
            kv_n = Hkv_local * Dh
            if "qkv_proj" not in lp:  # desc_act: unfused projections
                q = self._proj(x, lp["q_proj"])[:, :q_n]
                k = self._proj(x, lp["k_proj"])[:, :kv_n]
                v = self._proj(x, lp["v_proj"])[:, :kv_n]
                if a.qkv_bias:
                    q = q + lp["q_bias"].astype(jnp.float32)
                    k = k + lp["k_bias"].astype(jnp.float32)
                    v = v + lp["v_bias"].astype(jnp.float32)
            else:
                qkv = self._proj(
                    x,
                    lp["qkv_proj"],
                    rms=_rms_of(lp["input_norm"]) if fuse_qkv_norm else None,
                )
                if a.qkv_bias:
                    qkv = qkv + lp["qkv_bias"].astype(jnp.float32)
                q = qkv[:, :q_n]
                k = qkv[:, q_n : q_n + kv_n]
                # explicit end: tiled quant outputs may carry trailing N padding
                v = qkv[:, q_n + kv_n : q_n + 2 * kv_n]
            q = lora_add(q, lp, "q_proj", x)
            k = lora_add(k, lp, "k_proj", x)
            v = lora_add(v, lp, "v_proj", x)
            if a.qkv_clip > 0:
                # mpt attn_config.clip_qkv: clamp qkv activations
                q = jnp.clip(q, -a.qkv_clip, a.qkv_clip)
                k = jnp.clip(k, -a.qkv_clip, a.qkv_clip)
                v = jnp.clip(v, -a.qkv_clip, a.qkv_clip)
            T = q.shape[0]
            q = q.astype(h.dtype).reshape(T, H_local, Dh)
            k = k.astype(h.dtype).reshape(T, Hkv_local, Dh)
            v = v.astype(h.dtype).reshape(T, Hkv_local, Dh)
            if a.use_qk_norm:
                q = rms_norm(q, lp["q_norm"], a.rms_norm_eps)
                k = rms_norm(k, lp["k_norm"], a.rms_norm_eps)
            if cos is not None and "rope" not in _ablate:
                q = apply_rope(q, cos, sin, a.interleaved_rope)
                k = apply_rope(k, cos, sin, a.interleaved_rope)

            if self.kv_pack > 1:
                # Head packing (see ops/attention.py kv_layout): adjacent KV
                # head groups concat onto one 128-lane stored head; each q
                # head keeps zeros outside its owner slot so the kernel's
                # full-width q.k dot yields exactly its own head's score.
                pk = self.kv_pack
                k = k.reshape(T, Hkv_local // pk, pk * Dh)
                v = v.reshape(T, Hkv_local // pk, pk * Dh)
                slot_oh = jax.nn.one_hot(q_slot, pk, dtype=q.dtype)  # [H, pk]
                q = (slot_oh[None, :, :, None] * q[:, :, None, :]).reshape(
                    T, H_local, pk * Dh
                )
            elif self.kv_head_dim != Dh:
                pad = [(0, 0), (0, 0), (0, self.kv_head_dim - Dh)]
                q = jnp.pad(q, pad)
                k = jnp.pad(k, pad)
                v = jnp.pad(v, pad)

            if self.kv_quant:
                ks = lp["kv_scales"][0].astype(jnp.float32)
                vs = lp["kv_scales"][1].astype(jnp.float32)
            else:
                ks = vs = None
            if "scatter" not in _ablate:
                kvc = set_kv_cache(
                    kvc, k, v, mi.new_kv_slot_ids, k_scale=ks, v_scale=vs
                )
            if self.kv_quant:
                q = (q.astype(jnp.float32) * ks).astype(q.dtype)

            if windows is None:
                o = attend(q, kvc, a.sliding_window or None)
            else:
                # Per-layer window alternation (gemma2-style): the kernel
                # needs a STATIC window, so branch on the traced flag between
                # two statically-compiled variants.
                o = lax.cond(
                    window_flag > 0,
                    lambda q, kvc: attend(q, kvc, a.sliding_window),
                    lambda q, kvc: attend(q, kvc, None),
                    q,
                    kvc,
                )
            if self.kv_quant:
                o = (o.astype(jnp.float32) * vs).astype(o.dtype)
            if self.kv_pack > 1:
                # Each head's output lives in its owner slot of the packed
                # 128-lane V rows; select it back out.
                o = jnp.einsum(
                    "thpd,hp->thd",
                    o.reshape(T, H_local, self.kv_pack, Dh),
                    jax.nn.one_hot(q_slot, self.kv_pack, dtype=o.dtype),
                )
            elif self.kv_head_dim != Dh:
                o = o[..., :Dh]
            o_in = o.reshape(T, H_local * Dh)
            o = self._proj(o_in, lp["o_proj"])[:, : a.hidden_size]
            o = lora_add(o, lp, "o_proj", o_in)
            o = sp_combine(o)
            if a.o_proj_bias:
                o = o + lp["o_bias"].astype(jnp.float32)

            if a.parallel_residual:
                # phi-style: attention and MLP both read the same normed x.
                m = mlp(lp, x)
                h = h + o.astype(h.dtype) + m.astype(h.dtype)
                return h, kvc

            if a.residual_post_layernorm:
                o = self._norm(o.astype(h.dtype), lp["post_attn_norm"])
            h = h + o.astype(h.dtype)

            # ---- mlp
            fuse_mlp_norm = (
                a.n_experts == 0
                and a.mlp_gated
                and _can_fuse("post_norm", "post_norm_bias", "gate_up_proj")
            )
            if "norm" in _ablate or fuse_mlp_norm:
                x = h
            else:
                x = self._norm(h, lp["post_norm"], lp.get("post_norm_bias"))
            m = mlp(
                lp,
                sp_gather(x),
                rms=_rms_of(lp["post_norm"]) if fuse_mlp_norm else None,
            )
            if a.residual_post_layernorm:
                m = self._norm(m.astype(h.dtype), lp["post_ffw_norm"])
            h = h + m.astype(h.dtype)
            return h, kvc

        # Quant weights do NOT ride the scan xs: slicing a stacked [L, ...]
        # array per scan step materializes an HBM copy of the whole layer's
        # weights every iteration (measured 408 GB/s achieved weight
        # bandwidth scan-sliced vs 586+ GB/s copy-free on v5e for 8B INT4).
        # Instead the stacked arrays pass into the body whole (closure) and
        # the quant kernel streams layer li's tiles in place via in-kernel
        # double-buffered DMA (ops/quant_matmul.py stacked path).
        quant_stream = {}
        layers_xs = params["layers"]

        def _stream_alignable(v) -> bool:
            """The stacked stream path DMAs scale blocks at dynamic
            offsets; Mosaic needs the row extent 16-aligned (bf16) or
            8-aligned via quant_matmul's f32-upcast (K % 8G == 0).
            Unalignable K dims (gemma2's 3584/g128 → 28 rows) fall back
            to riding the scan xs — per-layer slice copies, slower but
            correct (the stream kernel would fail to COMPILE, and a
            failing remote compile retries forever)."""
            pack = 2 if self.quant.bits == 4 else 1
            K = v["qweight"].shape[2] * pack
            rows = v["scales"].shape[2]
            G = max(K // max(rows, 1), 1)
            return rows % 16 == 0 or (rows % 8 == 0 and K % (8 * G) == 0)

        if self.quant is not None:
            layers_xs = {}
            for name, v in params["layers"].items():
                if (
                    isinstance(v, dict)
                    and "qweight" in v
                    and v["qweight"].ndim == 4
                    and _stream_alignable(v)
                ):
                    quant_stream[name] = {
                        k2: v[k2] for k2 in ("qweight", "scales", "zeros")
                        if k2 in v  # expert pairs carry no zeros
                    }
                    layers_xs[name] = {
                        k2: v2
                        for k2, v2 in v.items()
                        if k2 not in ("qweight", "scales", "zeros")
                    }
                else:
                    layers_xs[name] = v
        xs = (layers_xs, kv_cache, jnp.arange(a.n_layers))
        if windows is not None:
            xs = xs + (windows,)
        h, new_kv = lax.scan(layer_fn, h, xs)

        h = self._norm(h, params["final_norm"], params.get("final_norm_bias"))
        if sp:
            # Back to the replicated full-T layout callers expect.
            h = lax.all_gather(h, tp_axis, axis=0, tiled=True)
        if all_hidden:
            return h, new_kv
        hidden_sel = h[mi.selected_idxes]  # [S, D]
        return hidden_sel, new_kv

    def logits(self, params: Dict[str, Any], hidden: jnp.ndarray) -> jnp.ndarray:
        """[S, D] → full [S, V] logits (all-gathered over tp when sharded)."""
        a = self.args
        if a.tie_word_embeddings:
            w = params["embed_tokens"].T  # [D, V] ([D, V/tp] vocab-sharded)
            logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
            if (
                self.parallel.tp_axis is not None
                and w.shape[1] != a.vocab_size
            ):
                logits = lax.all_gather(
                    logits, self.parallel.tp_axis, axis=1, tiled=True
                )
        elif isinstance(params["lm_head"], dict):
            from scalellm_tpu.ops.quant_matmul import quant_matmul

            lm = params["lm_head"]
            v_local = a.vocab_size // self.parallel.tp_size
            logits = quant_matmul(
                hidden, lm["qweight"], lm["scales"], lm["zeros"],
                bits=self._lm_head_bits(), symmetric=True,
            ).astype(jnp.float32)[:, :v_local]  # drop tile padding pre-gather
            if a.lm_head_bias:
                logits = logits + params["lm_head_bias"].astype(jnp.float32)
            if self.parallel.tp_axis is not None:
                logits = lax.all_gather(
                    logits, self.parallel.tp_axis, axis=1, tiled=True
                )
        else:
            logits = jnp.dot(hidden, params["lm_head"], preferred_element_type=jnp.float32)
            if a.lm_head_bias:
                logits = logits + params["lm_head_bias"].astype(jnp.float32)
            if self.parallel.tp_axis is not None:
                logits = lax.all_gather(
                    logits, self.parallel.tp_axis, axis=1, tiled=True
                )
        if a.final_logit_soft_cap > 0.0:
            cap = a.final_logit_soft_cap
            logits = cap * jnp.tanh(logits / cap)
        return logits
