"""DeepSeek-V2 family with Multi-head Latent Attention (MLA).

The reference left deepseek as a placeholder (src/models/deepseek/README.md
= "TODO") but ships MLA CUDA kernels (src/kernels/attention sm80_mla); this
implements the family end-to-end.

MLA: queries/keys split into a no-position part and a small shared rope
part; K/V are produced from a low-rank latent (kv_lora_rank) that the
checkpoint factorizes via kv_a/kv_b projections.

LATENT KV CACHE (the point of MLA): pages store only [c_kv | k_pe]
(kv_lora_rank + rope dims ≈ 576 per token) instead of H*(qk+v) decompressed
heads — a 7× (V2-Lite, H=16) to 57× (V2, H=128) KV-memory reduction vs MHA
(reference kernel: src/kernels/attention/kernel/sm80_kernel_mla.cuh). The
attention itself runs in the ABSORBED formulation, i.e. MLA-as-MQA:
  scores = q̃·c_kv + q_pe·k_pe   with q̃ = q_nope @ W_UK  (per head)
  out    = softmax(scores)·c_kv @ W_UV
where W_UK/W_UV are the two halves of kv_b. This folds the per-head K/V
decompression into the query/output instead of the cache. The cache is
K-ONLY ([P, page, 1, 640] pages): V is literally K[:, :kv_lora_rank], so
the attention ops read it back out of the K rows instead of storing V
rows (ops/mla_attention.py — dedicated Pallas decode kernel + jnp
prefill path; the TPU analog of the reference's sm80 MLA kernel).

MoE: first_k_dense_replace dense layers then MoE layers with shared experts
(added directly, no gate) and greedy or group-limited-greedy routing scaled
by routed_scaling_factor. The layer stack is split into two scans (dense,
MoE) since their parameter sets differ.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from scalellm_tpu.config import ModelArgs, hf_dtype
from scalellm_tpu.engine.params import ModelInputs
from scalellm_tpu.layers.activations import act_with_mul
from scalellm_tpu.layers.norms import rms_norm
from scalellm_tpu.layers.rope import apply_rope
from scalellm_tpu.models.registry import ModelRegistry
from scalellm_tpu.ops.attention import kernel_head_dim
from scalellm_tpu.ops.mla_attention import mla_paged_attention, set_latent_cache
from scalellm_tpu.parallel.config import ParallelConfig


def _parse_yarn(args: ModelArgs) -> Optional[Dict[str, float]]:
    rs = (args.raw or {}).get("rope_scaling")
    if not rs:
        return None
    rtype = rs.get("type") or rs.get("rope_type")
    if rtype != "yarn":
        raise ValueError(
            f"deepseek rope_scaling type {rtype!r} unsupported (only yarn)"
        )
    return {
        "factor": float(rs.get("factor", 1.0)),
        "original_max_position_embeddings": float(
            rs.get("original_max_position_embeddings", 4096)
        ),
        "beta_fast": float(rs.get("beta_fast", 32)),
        "beta_slow": float(rs.get("beta_slow", 1)),
        "mscale": float(rs.get("mscale", 1.0)),
        "mscale_all_dim": float(rs.get("mscale_all_dim", 0.0)),
    }


def _yarn_get_mscale(scale: float, mscale: float) -> float:
    if scale <= 1.0 or mscale == 0.0:
        return 1.0
    import math

    return 0.1 * mscale * math.log(scale) + 1.0


def _yarn_correction_range(beta_fast, beta_slow, dim, base, orig_max_pos):
    import math

    def correction_dim(num_rotations):
        return (
            dim * math.log(orig_max_pos / (num_rotations * 2 * math.pi))
        ) / (2 * math.log(base))

    low = math.floor(correction_dim(beta_fast))
    high = math.ceil(correction_dim(beta_slow))
    return max(low, 0), min(high, dim - 1)


def _dtype_of(args: ModelArgs):
    # float16 checkpoints run as bfloat16: the TPU compute path (MXU, Mosaic
    # kernels) has no fp16 support, and bf16's range supersets fp16's.
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.bfloat16}[
        args.dtype
    ]


class MLADecoderModel:
    """DeepSeek-V2 causal LM.

    Tensor parallelism (head-sharded): q_b/q_proj and kv_b are
    column-parallel on the head dim, o_proj row-parallel (psum after); the
    small latent path (kv_a, kv_a_norm, q_a) is replicated — every shard
    computes the same [c_kv | k_pe] and the latent KV cache itself is
    replicated (it is tiny by construction, that being MLA's point). Each
    shard then runs absorbed-MQA attention for its local heads over the full
    shared latent. Experts shard over the same axis (expert-parallel when
    n_experts divides, else FFN-dim); shared experts and dense FFNs are
    Megatron column/row-parallel.
    """

    mla = True  # executor compiles a decode_only program variant
                # (routes to the latent-MQA Pallas decode kernel)

    def __init__(self, args: ModelArgs, parallel: ParallelConfig = ParallelConfig(), attn_impl=None):
        self.args = args
        self.parallel = parallel
        self.attn_impl = attn_impl or mla_paged_attention
        a = args
        tp = parallel.tp_size
        assert a.n_heads % tp == 0, "n_heads must divide tp_size"
        self.qk_head_dim = a.qk_nope_head_dim + a.qk_rope_head_dim
        # Latent cache: one shared kv "head" holding [c_kv | k_pe],
        # lane-padded for the attention kernel (576 → 640 on TPU).
        self.latent_dim = a.kv_lora_rank + a.qk_rope_head_dim
        self.kv_head_dim = kernel_head_dim(self.latent_dim)
        self.n_local_heads = a.n_heads // tp
        self.n_local_kv_heads = 1  # MLA absorbed = MQA over the latent
        self.kv_replication = 1
        self.quant = None  # pre-quantized (GPTQ/AWQ) deepseek checkpoints TBD
        # Runtime-quantized ROUTED EXPERTS (int8, per-expert per-channel —
        # ops/moe_quant.py): the experts are ~93% of V2-class weights, so
        # this alone turns a 29 GB V2-Lite into ~10 GB, and the decode path
        # streams only the ROUTED experts' blocks instead of scan-slicing
        # the full stacked expert arrays every layer (int8 or int4-g128 by
        # requested bits). See proj_quant below for the non-expert mats.
        self.moe_quant = bool(
            a.n_experts > 0 and a.quant_args and a.quant_args.enabled
        )
        # int4: packed nibbles + per-(expert, k-group, channel) grids
        # (group 128); int8: per-(expert, channel). V2-Lite experts:
        # 28.8 GB bf16 → 14.4 int8 → 7.2 int4 (full depth fits one v5e).
        self.moe_quant_bits = (
            a.quant_args.bits if self.moe_quant and a.quant_args.bits else 8
        )
        # Runtime int8-g128 for the big PLAIN projections of MoE layers
        # (q_proj, o_proj, shared experts) and the lm_head: after expert
        # quantization these are most of the remaining decode bytes
        # (~54 MB/layer + 420 MB lm_head bf16 at V2-Lite dims). Streamed
        # layer-stacked like common.py's quant path. Single-shard only
        # (TP shards keep bf16 projections + quantized experts).
        self.proj_quant = bool(self.moe_quant and tp == 1)
        self.kv_quant = a.kv_cache_dtype == "int8"
        self.moe_expert_sharded = (
            a.n_experts > 0 and tp > 1 and a.n_experts % tp == 0
        )
        if tp > 1:
            assert a.intermediate_size % tp == 0
            if a.n_experts and not self.moe_expert_sharded:
                assert a.moe_intermediate_size % tp == 0
            if a.n_shared_experts:
                assert (a.moe_intermediate_size * a.n_shared_experts) % tp == 0
        self.n_dense = a.first_k_dense_replace
        self.n_moe = a.n_layers - self.n_dense
        # Yarn rope scaling (DeepSeek-V2/V2-Lite long-context checkpoints):
        # precompute the blended inv_freq + attention-scale multiplier
        # (HF DeepseekV2YarnRotaryEmbedding + softmax_scale mscale adjustment).
        self._yarn = _parse_yarn(a)
        self.sm_scale = self.qk_head_dim ** -0.5
        if self._yarn is not None:
            m = _yarn_get_mscale(self._yarn["factor"], self._yarn["mscale_all_dim"])
            self.sm_scale = self.sm_scale * m * m

    # ------------------------------------------------------------ param spec

    def _quant_triple(self, L: int, K: int, N: int) -> Dict[str, Tuple]:
        """Tiled group-quant triple shapes (L, n_n, R, W) for a plain
        [K, N] projection at moe_quant_bits (int4 packs two K rows per
        byte; ops/quant_matmul.py tiled layout; N padded up to a tile
        multiple — callers slice outputs back to N). Group size from
        _pick_group (128 when K allows; smaller for awkward K)."""
        from scalellm_tpu.ops.quant_matmul import DEFAULT_TILE_N

        G = self._pick_group(K)
        assert G, K
        pack = 2 if self.moe_quant_bits == 4 else 1
        W = min(DEFAULT_TILE_N, N)
        n_n = -(-N // W)
        return {
            "qweight": (L, n_n, K // pack, W),
            "scales": (L, n_n, K // G, W),
            "zeros": (L, n_n, K // G, W),
        }

    def _pick_group(self, K: int):
        """Largest group size whose scale blocks the layer-stacked stream
        path can DMA AND whose K can be k-tiled: Mosaic needs the
        [K/G, W] scale sublane extent 16-aligned for bf16 scales (or
        8-aligned after quant_matmul's automatic f32-upcast, which
        engages when K % (8G) == 0), and the activation block's lane
        extent (block_k) must be a multiple of 128 that divides K while
        keeping the weight tile inside the VMEM budget. V2-Lite examples:
        K=2048 → 128; shared_down K=2816 → 32 (22 rows at g128 align
        nowhere; at g32 block_k=2816 itself works on the f32 path);
        dense_down K=10944 → None (2-adic valuation 6: no divisor is a
        multiple of 128 — stays bf16). None = not quantizable."""
        pack = 2 if self.moe_quant_bits == 4 else 1
        for G in (128, 64, 32, 16, 8):
            if K % G:
                continue
            rows = K // G
            if rows % 16 == 0:
                chunk = 16 * G  # bf16 scales tile directly
            elif rows % 8 == 0 and K % (8 * G) == 0:
                chunk = 8 * G  # f32-upcast path
            else:
                continue
            # A usable block_k: multiple of both chunk and 128, divides K,
            # weight tile ≤ the 4 MB VMEM budget at the default tile width.
            import math

            step = math.lcm(chunk, 128)
            bk = (K // step) * step
            while bk >= step:
                if K % bk == 0 and (bk // pack) * 1024 <= 4 * 1024 * 1024:
                    return G
                bk -= step
        return None

    def _can_quant(self, K: int) -> bool:
        return self._pick_group(K) is not None

    def _attn_shapes(self, L: int, quant: bool = False) -> Dict[str, Any]:
        a = self.args
        D, H = a.hidden_size, a.n_heads
        qk, r = self.qk_head_dim, a.qk_rope_head_dim
        shapes: Dict[str, Any] = {
            "input_norm": (L, D),
            "post_norm": (L, D),
            # kv_a stays bf16: its output width R+r (576 on every real
            # deepseek) is not a 128-lane multiple, and Mosaic cannot
            # DMA-slice 576 of the 640 padded lanes (measured: memref_slice
            # lowering error). Only ~2.4 MB/layer — not worth a padded
            # storage variant. Width gate below for hypothetical aligned
            # configs.
            "kv_a": (
                self._quant_triple(L, D, a.kv_lora_rank + r)
                if quant and self._can_quant(D)
                and (a.kv_lora_rank + r) % 128 == 0
                else (L, D, a.kv_lora_rank + r)
            ),
            "kv_a_norm": (L, a.kv_lora_rank),
            "kv_b": (L, a.kv_lora_rank, H * (a.qk_nope_head_dim + a.v_head_dim)),
            # o_proj / q_proj: the two big plain matmuls — int8 when quant
            # (kv_a is tiny; kv_b is consumed as per-head absorb einsums).
            "o_proj": (
                self._quant_triple(L, H * a.v_head_dim, D)
                if quant and self._can_quant(H * a.v_head_dim)
                else (L, H * a.v_head_dim, D)
            ),
        }
        if a.q_lora_rank:
            shapes["q_a"] = (L, D, a.q_lora_rank)
            shapes["q_a_norm"] = (L, a.q_lora_rank)
            shapes["q_b"] = (
                self._quant_triple(L, a.q_lora_rank, H * qk)
                if quant and self._can_quant(a.q_lora_rank)
                else (L, a.q_lora_rank, H * qk)
            )
        else:
            shapes["q_proj"] = (
                self._quant_triple(L, D, H * qk)
                if quant and self._can_quant(D)
                else (L, D, H * qk)
            )
        return shapes

    def param_shapes(self) -> Dict[str, Any]:
        a = self.args
        D, V = a.hidden_size, a.vocab_size
        shapes: Dict[str, Any] = {"embed_tokens": (V, D), "final_norm": (D,)}
        if self.n_dense:
            # Dense stack: same quantization policy as the MoE stack —
            # V2-Lite's single dense layer streamed 134 MB of bf16 FFN per
            # step (~0.2 ms at the machine's 700 GB/s) before this.
            dense = self._attn_shapes(self.n_dense, quant=self.proj_quant)
            F = a.intermediate_size
            if self.proj_quant and self._can_quant(D):
                dense["gate_proj"] = self._quant_triple(self.n_dense, D, F)
                dense["up_proj"] = self._quant_triple(self.n_dense, D, F)
            else:
                dense["gate_proj"] = (self.n_dense, D, F)
                dense["up_proj"] = (self.n_dense, D, F)
            if self.proj_quant and self._can_quant(F):
                dense["down_proj"] = self._quant_triple(self.n_dense, F, D)
            else:
                dense["down_proj"] = (self.n_dense, F, D)
            shapes["dense_layers"] = dense
        if self.n_moe:
            L, E, Fm = self.n_moe, a.n_experts, a.moe_intermediate_size
            moe = self._attn_shapes(L, quant=self.proj_quant)
            moe["router"] = (L, D, E)
            if self.moe_quant and self.moe_quant_bits == 4:
                G = a.quant_args.group_size or 128
                while G > 8 and (D % G or Fm % G):
                    G //= 2  # tiny test dims: shrink to a common divisor
                assert D % G == 0 and Fm % G == 0, (D, Fm, G)
                moe["moe_gate"] = {"qweight": (L, E, D // 2, Fm),
                                   "scales": (L, E, D // G, Fm)}
                moe["moe_up"] = {"qweight": (L, E, D // 2, Fm),
                                 "scales": (L, E, D // G, Fm)}
                moe["moe_down"] = {"qweight": (L, E, Fm // 2, D),
                                   "scales": (L, E, Fm // G, D)}
            elif self.moe_quant:
                moe["moe_gate"] = {"qweight": (L, E, D, Fm),
                                   "scales": (L, E, Fm)}
                moe["moe_up"] = {"qweight": (L, E, D, Fm),
                                 "scales": (L, E, Fm)}
                moe["moe_down"] = {"qweight": (L, E, Fm, D),
                                   "scales": (L, E, D)}
            else:
                moe["moe_gate"] = (L, E, D, Fm)
                moe["moe_up"] = (L, E, D, Fm)
                moe["moe_down"] = (L, E, Fm, D)
            Fs = Fm * a.n_shared_experts
            if Fs:
                if self.proj_quant and self._can_quant(D):
                    moe["shared_gate_proj"] = self._quant_triple(L, D, Fs)
                    moe["shared_up_proj"] = self._quant_triple(L, D, Fs)
                else:
                    moe["shared_gate_proj"] = (L, D, Fs)
                    moe["shared_up_proj"] = (L, D, Fs)
                if self.proj_quant and self._can_quant(Fs):
                    moe["shared_down_proj"] = self._quant_triple(L, Fs, D)
                else:
                    moe["shared_down_proj"] = (L, Fs, D)
            shapes["moe_layers"] = moe
        if not a.tie_word_embeddings:
            if self.proj_quant and self._can_quant(D):
                # int8 lm_head: halves the biggest single decode read
                # (V2-Lite: 420 MB bf16 → 210 MB). Triple shapes are the
                # (1, ...)-stacked tiled layout with the lead dim dropped.
                tr = self._quant_triple(1, D, V)
                shapes["lm_head"] = {k: v[1:] for k, v in tr.items()}
            else:
                shapes["lm_head"] = (D, V)
        return shapes

    load_param_shapes = param_shapes  # no fusion (yet)

    def _lm_head_bits(self) -> int:
        return self.moe_quant_bits  # proj_quant lm_head follows the bits

    def tile_quant_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Flat runtime-quantized triples → the N-tiled storage layout of
        param_shapes() (same convention as DecoderModel.tile_quant_params;
        expert pairs already carry their [L, E, ...] layout)."""
        import numpy as np

        if not self.proj_quant:
            return params
        from scalellm_tpu.ops.quant_matmul import (
            DEFAULT_TILE_N, tile_quant_layout,
        )

        def tile_triple(triple):
            W = min(DEFAULT_TILE_N, triple["qweight"].shape[-1])
            return {k: tile_quant_layout(v, W) for k, v in triple.items()}

        for stack in ("moe_layers", "dense_layers"):
            grp = params.get(stack, {})
            for name, node in list(grp.items()):
                if (
                    isinstance(node, dict)
                    and "zeros" in node
                    and np.asarray(node["qweight"]).ndim == 3
                ):
                    grp[name] = tile_triple(node)
        lm = params.get("lm_head")
        if isinstance(lm, dict) and np.asarray(lm["qweight"]).ndim == 2:
            params["lm_head"] = tile_triple(lm)
        return params

    def _attn_specs(self, tp, quant: bool = False) -> Dict[str, Any]:
        """Head-sharded MLA specs (see class docstring). The head dim is
        MAJOR in every H*{qk,nope+vd,vd} flattened axis, so sharding that
        axis into tp chunks yields head-contiguous slices."""
        a = self.args
        specs: Dict[str, Any] = {
            "input_norm": P(None, None),
            "post_norm": P(None, None),
            "kv_a": P(None, None, None),  # replicated latent path
            "kv_a_norm": P(None, None),
            "kv_b": P(None, None, tp),  # column-parallel (heads)
            "o_proj": P(None, tp, None),  # row-parallel (heads), psum after
        }
        if a.q_lora_rank:
            specs["q_a"] = P(None, None, None)
            specs["q_a_norm"] = P(None, None)
            specs["q_b"] = P(None, None, tp)
        else:
            specs["q_proj"] = P(None, None, tp)
        if quant:
            # proj_quant is single-shard only: quant triples replicate.
            rep4 = {"qweight": P(None, None, None, None),
                    "scales": P(None, None, None, None),
                    "zeros": P(None, None, None, None)}
            if self._can_quant(a.n_heads * a.v_head_dim):
                specs["o_proj"] = dict(rep4)
            if a.q_lora_rank:
                if self._can_quant(a.q_lora_rank):
                    specs["q_b"] = dict(rep4)
            elif self._can_quant(a.hidden_size):
                specs["q_proj"] = dict(rep4)
        return specs

    def param_partition_specs(self) -> Dict[str, Any]:
        a = self.args
        tp = self.parallel.tp_axis
        specs: Dict[str, Any] = {
            "embed_tokens": P(None, None),
            "final_norm": P(None),
        }
        if self.n_dense:
            dense = self._attn_specs(tp, quant=self.proj_quant)
            rep4 = {"qweight": P(None, None, None, None),
                    "scales": P(None, None, None, None),
                    "zeros": P(None, None, None, None)}
            F = a.intermediate_size
            if self.proj_quant and self._can_quant(a.hidden_size):
                dense["gate_proj"] = dict(rep4)
                dense["up_proj"] = dict(rep4)
            else:
                dense["gate_proj"] = P(None, None, tp)
                dense["up_proj"] = P(None, None, tp)
            if self.proj_quant and self._can_quant(F):
                dense["down_proj"] = dict(rep4)
            else:
                dense["down_proj"] = P(None, tp, None)
            specs["dense_layers"] = dense
        if self.n_moe:
            moe = self._attn_specs(tp, quant=self.proj_quant)
            moe["router"] = P(None, None, None)
            if self.moe_quant:
                # Quantized experts shard over the expert dim only (EP when
                # tp divides E; replicated otherwise — the routed-only
                # decode kernel reads k/E of the bytes either way).
                ep = tp if self.moe_expert_sharded else None
                sc_tail = (None, None) if self.moe_quant_bits == 4 else (None,)
                qspec = {
                    "qweight": P(None, ep, None, None),
                    "scales": P(None, ep, *sc_tail),
                }
                moe["moe_gate"] = dict(qspec)
                moe["moe_up"] = dict(qspec)
                moe["moe_down"] = dict(qspec)
            elif self.moe_expert_sharded:
                moe["moe_gate"] = P(None, tp, None, None)
                moe["moe_up"] = P(None, tp, None, None)
                moe["moe_down"] = P(None, tp, None, None)
            else:
                moe["moe_gate"] = P(None, None, None, tp)
                moe["moe_up"] = P(None, None, None, tp)
                moe["moe_down"] = P(None, None, tp, None)
            if a.n_shared_experts:
                rep4 = {"qweight": P(None, None, None, None),
                        "scales": P(None, None, None, None),
                        "zeros": P(None, None, None, None)}
                Fs_ = a.moe_intermediate_size * a.n_shared_experts
                if self.proj_quant and self._can_quant(a.hidden_size):
                    moe["shared_gate_proj"] = dict(rep4)
                    moe["shared_up_proj"] = dict(rep4)
                else:
                    moe["shared_gate_proj"] = P(None, None, tp)
                    moe["shared_up_proj"] = P(None, None, tp)
                if self.proj_quant and self._can_quant(Fs_):
                    moe["shared_down_proj"] = dict(rep4)
                else:
                    moe["shared_down_proj"] = P(None, tp, None)
            specs["moe_layers"] = moe
        if not a.tie_word_embeddings:
            if self.proj_quant and self._can_quant(a.hidden_size):
                specs["lm_head"] = {"qweight": P(None, None, None),
                                    "scales": P(None, None, None),
                                    "zeros": P(None, None, None)}
            else:
                specs["lm_head"] = P(None, tp)  # vocab-sharded, all-gathered
        return specs

    def kv_cache_shape(self, num_pages: int, page_size: int) -> Tuple[int, ...]:
        # ONE K-only latent head per token ([c_kv | k_pe], lane-padded):
        # V is the first kv_lora_rank lanes of K, so storing V rows would
        # double the latent footprint for no information (ops/mla_attention).
        a = self.args
        return (a.n_layers, num_pages, page_size, 1, self.kv_head_dim)

    def kv_cache_partition_spec(self) -> P:
        return P(None, None, None, None, None)

    def init_params(self, rng_key, scale: float = 0.02) -> Dict[str, Any]:
        dtype = _dtype_of(self.args)

        def init_leaf(path, shape, key):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name == "qweight":  # quantized experts / projections
                return jax.random.randint(key, shape, -127, 128, jnp.int8)
            if name == "zeros":
                return jnp.zeros(shape, jnp.int8)
            if name == "scales":
                return jnp.full(shape, 0.01, jnp.float32)
            if name.endswith("norm"):
                return jnp.ones(shape, dtype)
            return (
                jax.random.normal(key, shape, dtype=jnp.float32) * scale
            ).astype(dtype)

        paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(
            self.param_shapes(), is_leaf=lambda x: isinstance(x, tuple)
        )
        keys = jax.random.split(rng_key, len(paths_leaves))
        return jax.tree_util.tree_unflatten(
            treedef,
            [init_leaf(p, s, k) for (p, s), k in zip(paths_leaves, keys)],
        )

    # --------------------------------------------------------------- forward

    def _rope_tables(self, positions):
        """cos/sin over the rope head dim (deepseek: rope over
        qk_rope_head_dim, interleaved pair convention; yarn-scaled when the
        checkpoint carries rope_scaling, matching HF
        DeepseekV2YarnRotaryEmbedding incl. the mscale cos/sin multiplier)."""
        import numpy as np

        a = self.args
        r = a.qk_rope_head_dim
        inv_freq = 1.0 / (
            a.rope_theta ** (np.arange(0, r, 2, dtype=np.float64) / r)
        )
        mscale = 1.0
        if self._yarn is not None:
            y = self._yarn
            inv_freq_inter = inv_freq / y["factor"]
            low, high = _yarn_correction_range(
                y["beta_fast"], y["beta_slow"], r, a.rope_theta,
                y["original_max_position_embeddings"],
            )
            ramp = np.clip(
                (np.arange(r // 2, dtype=np.float64) - low) / max(high - low, 1e-3),
                0.0, 1.0,
            )
            extra_mask = 1.0 - ramp
            inv_freq = inv_freq_inter * (1.0 - extra_mask) + inv_freq * extra_mask
            mscale = _yarn_get_mscale(y["factor"], y["mscale"]) / _yarn_get_mscale(
                y["factor"], y["mscale_all_dim"]
            )
        freqs = positions.astype(jnp.float32)[:, None] * jnp.asarray(
            inv_freq.astype(np.float32)
        )[None, :]
        return jnp.cos(freqs) * mscale, jnp.sin(freqs) * mscale

    def _qmm(self, x, w, li=None, n=None):
        """x @ tiled int8-g128 triple (f32 result); slices tile-padding
        back to n. Layer-stacked triples stream at the li offset
        (ops/quant_matmul.py stacked path — no scan-slice copies)."""
        from scalellm_tpu.ops.quant_matmul import quant_matmul

        out = quant_matmul(
            x, w["qweight"], w["scales"], w["zeros"],
            bits=self.moe_quant_bits, symmetric=True, layer=li,
        )
        return out[:, :n] if n is not None else out

    def _attention(self, lp, h, mi, cos, sin, kvc, decode_only=False,
                   stream=None, li=None):
        """Absorbed MLA-as-MQA over the latent cache (see module docstring).

        Cache write: K = [c_kv | k_pe_roped], V = [c_kv | 0] (one shared
        head, lane-padded). Query: [q_nope @ W_UK | q_pe]. Output:
        attention latent @ W_UV. Numerically identical to decompressed MHA:
        q_nope·k_nope = (q_nope W_UK)·c_kv and attn·v = (attn·c_kv) W_UV.
        """
        a = self.args
        H = self.n_local_heads
        nope, r, vd = a.qk_nope_head_dim, a.qk_rope_head_dim, a.v_head_dim
        qk = self.qk_head_dim
        R = a.kv_lora_rank
        Dc = self.kv_head_dim
        T = h.shape[0]

        stream = stream or {}
        x = rms_norm(h, lp["input_norm"], a.rms_norm_eps)
        if a.q_lora_rank:
            qa = jnp.dot(x, lp["q_a"], preferred_element_type=jnp.float32)
            qa = rms_norm(qa.astype(h.dtype), lp["q_a_norm"], a.rms_norm_eps)
            if "q_b" in stream:
                q = self._qmm(qa, stream["q_b"], li, H * qk)
            else:
                q = jnp.dot(qa, lp["q_b"], preferred_element_type=jnp.float32)
        elif "q_proj" in stream:
            q = self._qmm(x, stream["q_proj"], li, H * qk)
        else:
            q = jnp.dot(x, lp["q_proj"], preferred_element_type=jnp.float32)
        q = q.astype(h.dtype).reshape(T, H, qk)
        q_nope, q_pe = q[..., :nope], q[..., nope:]

        if "kv_a" in stream:
            ckv = self._qmm(x, stream["kv_a"], li, R + r).astype(h.dtype)
        else:
            ckv = jnp.dot(
                x, lp["kv_a"], preferred_element_type=jnp.float32
            ).astype(h.dtype)
        c_kv, k_pe = ckv[:, : R], ckv[:, R:]
        c_kv = rms_norm(c_kv, lp["kv_a_norm"], a.rms_norm_eps)

        # Rope on the positional parts (shared single-head k_pe).
        q_pe = apply_rope(q_pe, cos, sin, interleaved=True)
        k_pe = apply_rope(k_pe[:, None, :], cos, sin, interleaved=True)[:, 0]

        # kv_b split into the absorb matrices: [R, H, nope] and [R, H, vd].
        w_kv = lp["kv_b"].reshape(R, H, nope + vd)
        w_uk, w_uv = w_kv[..., :nope], w_kv[..., nope:]
        q_abs = jnp.einsum(
            "thn,rhn->thr", q_nope, w_uk, preferred_element_type=jnp.float32
        ).astype(h.dtype)

        # One shared K-ONLY latent head: K = [c_kv | k_pe] (V is read as
        # K[:, :R] inside the attention op — half the cache of a K+V layout).
        k_lat = jnp.concatenate([c_kv, k_pe], axis=-1)  # [T, R+r]
        k_lat = jnp.pad(k_lat, ((0, 0), (0, Dc - R - r)))
        q_cat = jnp.concatenate([q_abs, q_pe], axis=-1)  # [T, H, R+r]
        q_cat = jnp.pad(q_cat, ((0, 0), (0, 0), (0, Dc - R - r)))

        kv_scale = a.kv_scale if self.kv_quant else None
        kvc = set_latent_cache(kvc, k_lat, mi.new_kv_slot_ids, scale=kv_scale)
        o_lat = self.attn_impl(
            q_cat,
            kvc,
            mi.kv_lens,
            mi.block_tables,
            mi.cu_q_lens,
            mi.num_seqs,
            sm_scale=self.sm_scale,
            v_dim=R,
            k_scale=kv_scale,
            decode_only=decode_only,
        )  # [T, H, R]
        o = jnp.einsum(
            "thr,rhv->thv", o_lat.astype(h.dtype), w_uv,
            preferred_element_type=jnp.float32,
        )
        o_in = o.astype(h.dtype).reshape(T, H * vd)
        if "o_proj" in stream:
            o = self._qmm(o_in, stream["o_proj"], li, a.hidden_size)
        else:
            o = jnp.dot(
                o_in, lp["o_proj"], preferred_element_type=jnp.float32
            )
        if self.parallel.tp_axis is not None:
            o = lax.psum(o, self.parallel.tp_axis)
        return h + o.astype(h.dtype), kvc

    def _router(self, x, router_w):
        """DeepSeek gate: softmax scores, greedy or group-limited top-k; then
        either top-k normalization (norm_topk_prob, V2.5/V3-style gates) or
        routed_scaling_factor (HF DeepseekV2MoEGate applies the scaling factor
        only in the non-normalized branch)."""
        a = self.args
        scores = jax.nn.softmax(
            jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32)), axis=-1
        )
        if a.topk_method == "group_limited_greedy":
            T, E = scores.shape
            g = a.n_group
            group_scores = scores.reshape(T, g, E // g).max(axis=-1)  # [T, g]
            _, group_idx = jax.lax.top_k(group_scores, a.topk_group)
            group_mask = jnp.zeros((T, g)).at[
                jnp.arange(T)[:, None], group_idx
            ].set(1.0)
            mask = jnp.repeat(group_mask, E // g, axis=-1)
            scores = jnp.where(mask > 0, scores, 0.0)
        topk_w, topk_e = jax.lax.top_k(scores, a.n_experts_per_token)
        if a.norm_topk_prob and a.n_experts_per_token > 1:
            topk_w = topk_w / (jnp.sum(topk_w, axis=-1, keepdims=True) + 1e-20)
        else:
            topk_w = topk_w * a.routed_scaling_factor
        return topk_w, topk_e

    def _moe_ffn(self, lp, x, expert_stream=None, li=None, stream=None):
        import os as _os

        # Perf-decomposition ablations (BENCH_ABLATE, trace-time only):
        # "routed" skips the routed-expert matmuls, "shared" the shared
        # experts — same discipline as bench.py's BENCH_ABLATE=logits.
        _ablate = _os.environ.get("BENCH_ABLATE", "")
        a = self.args
        topk_w, topk_e = self._router(x, lp["router"])
        T = x.shape[0]
        k = a.n_experts_per_token
        if expert_stream is not None:
            E_local = expert_stream["moe_gate"]["qweight"].shape[1]
        else:
            E_local = lp["moe_gate"].shape[0]
        flat_e = topk_e.reshape(-1)
        flat_w = topk_w.reshape(-1)
        from scalellm_tpu.layers.moe import _grouped_matmul, _on_tpu

        # T=1 fast dispatch (decode b=1, the latency-critical shape): the
        # top-k expert ids are already DISTINCT, so the expert-sorted-rows
        # contract can be met without sorting at all — row j simply belongs
        # to top-k slot j's expert (starts[e_j] = j, sizes[e_j] = 1), the
        # activation rows are one broadcast of the single token, and the
        # combine is a weighted row-sum. Removes the per-layer argsort /
        # bincount / nonzero-compaction / gather / scatter-add small-op
        # chain (~6 XLA launches × 26 MoE layers at V2-Lite b=1).
        # Kernel-path only: the unsorted layout is invalid for gmm, so
        # gate on fits_decode_kernel.
        t1_fast = (
            T == 1
            and expert_stream is not None
            and "routed" not in _ablate
            and not (self.moe_expert_sharded
                     and self.parallel.tp_axis is not None)
            and (_on_tpu() or _os.environ.get("MOE_DISPATCH_T1") == "force")
            and _os.environ.get("MOE_DISPATCH_T1", "1") != "0"
        )
        if t1_fast:
            from scalellm_tpu.ops.moe_quant import (
                fits_decode_kernel,
                grouped_quant_matmul,
                grouped_quant_matmul_pair,
            )

            D = x.shape[1]
            Tp = ((k + 7) // 8) * 8  # sublane row tile
            int4 = expert_stream["moe_gate"]["qweight"].shape[-2] * 2 == D
            Kw_d = expert_stream["moe_down"]["qweight"].shape[-2]
            t1_fast = (
                fits_decode_kernel(Tp, D, expert_stream["moe_gate"])
                and fits_decode_kernel(
                    Tp, Kw_d * 2 if int4 else Kw_d,
                    expert_stream["moe_down"],
                )
            )
        if t1_fast:
            e_sel = topk_e[0].astype(jnp.int32)  # [k], distinct by top_k
            w_sel = topk_w[0].astype(jnp.float32)
            xs = jnp.broadcast_to(x, (Tp, D)).astype(x.dtype)
            sizes = jnp.zeros((E_local,), jnp.int32).at[e_sel].set(1)
            starts = jnp.zeros((E_local,), jnp.int32).at[e_sel].set(
                jnp.arange(k, dtype=jnp.int32)
            )
            cap = min(int(E_local), k)
            if _os.environ.get("MOE_FUSE_GATE_UP", "1") != "0":
                g, u = grouped_quant_matmul_pair(
                    xs, expert_stream["moe_gate"], expert_stream["moe_up"],
                    sizes, layer=li, max_active=cap, active=e_sel,
                    starts=starts,
                )
            else:
                g = grouped_quant_matmul(
                    xs, expert_stream["moe_gate"], sizes, layer=li,
                    max_active=cap, active=e_sel, starts=starts)
                u = grouped_quant_matmul(
                    xs, expert_stream["moe_up"], sizes, layer=li,
                    max_active=cap, active=e_sel, starts=starts)
            hidden = (jax.nn.silu(g) * u).astype(x.dtype)
            y = grouped_quant_matmul(
                hidden, expert_stream["moe_down"], sizes, layer=li,
                max_active=cap, active=e_sel, starts=starts)
            w_col = jnp.zeros((Tp,), jnp.float32).at[
                jnp.arange(k, dtype=jnp.int32)].set(w_sel)
            out = jnp.sum(y * w_col[:, None], axis=0, keepdims=True)
            return self._moe_shared(lp, x, out, stream, li, _ablate)

        if self.moe_expert_sharded and self.parallel.tp_axis is not None:
            # Expert parallelism (see layers/moe.py moe_mlp): keep only this
            # shard's experts; remote-expert slots route to the overflow
            # group with zero weight.
            shard = jax.lax.axis_index(self.parallel.tp_axis)
            lo = shard * E_local
            local = flat_e - lo
            in_range = (local >= 0) & (local < E_local)
            flat_e = jnp.where(in_range, local, E_local)
            flat_w = jnp.where(in_range, flat_w, 0.0)
        # Row-tile padding (see layers/moe.py row_align): 128 for megablox,
        # but only 8 for the quantized decode kernel — padding b=1's six
        # rows to 128 made every expert dot 21× wider than needed (the
        # routed path measured 104.5 µs/layer vs its 38 µs DMA floor).
        # Padding routes to the overflow group E_local and stays uncovered.
        from scalellm_tpu.layers.moe import row_align

        total = flat_e.shape[0]
        align = row_align(expert_stream is not None, total)
        if _on_tpu() and total % align != 0:
            pad = align - total % align
            flat_e = jnp.concatenate([flat_e, jnp.full((pad,), E_local, flat_e.dtype)])
            flat_w = jnp.concatenate([flat_w, jnp.zeros((pad,), flat_w.dtype)])
        order = jnp.argsort(flat_e)
        token_of = jnp.minimum(order // k, T - 1)
        xs = x[token_of]
        group_sizes = jnp.bincount(flat_e, length=E_local).astype(jnp.int32)

        if "routed" in _ablate:
            y = jnp.zeros((xs.shape[0], a.hidden_size), jnp.float32)
        elif expert_stream is not None:
            from scalellm_tpu.ops.moe_quant import grouped_quant_matmul

            # T tokens route to at most T*top_k distinct experts: cap the
            # decode kernel's expert grid (b=1 top-6 → 6 cells, not E=64).
            cap = min(int(E_local), T * k)

            def gm(rows, name):
                return grouped_quant_matmul(
                    rows, expert_stream[name], group_sizes, layer=li,
                    max_active=cap,
                )

            if _os.environ.get("MOE_FUSE_GATE_UP", "1") != "0":
                # Fused gate+up: one kernel streams both projections'
                # expert tiles (2 launches/layer instead of 3 —
                # DEEPSEEK_DECOMP.md named the ~8 launches/layer as an
                # above-floor cost; measured on v5e V2-Lite b=1:
                # 253.9 → 259.2 tok/s, +2.1%). Falls back to two calls
                # when the shapes differ or the decode-path gates reject.
                from scalellm_tpu.ops.moe_quant import (
                    grouped_quant_matmul_pair,
                )

                g, u = grouped_quant_matmul_pair(
                    xs, expert_stream["moe_gate"], expert_stream["moe_up"],
                    group_sizes, layer=li, max_active=cap,
                )
            else:
                g = gm(xs, "moe_gate")
                u = gm(xs, "moe_up")
            hidden = (jax.nn.silu(g) * u).astype(x.dtype)
            y = gm(hidden, "moe_down")
        else:
            g = _grouped_matmul(xs, lp["moe_gate"], group_sizes)
            u = _grouped_matmul(xs, lp["moe_up"], group_sizes)
            hidden = (jax.nn.silu(g) * u).astype(x.dtype)
            y = _grouped_matmul(hidden, lp["moe_down"], group_sizes)
        w_sorted = flat_w[order]
        covered = jnp.sum(group_sizes)
        row_idx = jnp.arange(y.shape[0])
        y = jnp.where((row_idx < covered)[:, None], y, 0.0)
        y = y * w_sorted[:, None]
        out = jnp.zeros((T, y.shape[-1]), jnp.float32).at[token_of].add(
            y, mode="drop"
        )
        return self._moe_shared(lp, x, out, stream, li, _ablate)

    def _moe_shared(self, lp, x, out, stream, li, _ablate):
        """Shared experts: plain gated FFN added directly (no gate scalar).
        Each projection independently takes the quantized stream or the
        bf16 scan param (alignment-gated: e.g. V2-Lite's shared_down has
        K=2816 whose scale rows can't sublane-align — see _can_quant)."""
        a = self.args
        stream = stream or {}
        if "shared" in _ablate:
            pass
        elif "shared_gate_proj" in stream or "shared_gate_proj" in lp:
            Fs = a.moe_intermediate_size * a.n_shared_experts

            def shproj(name, inp, n):
                if name in stream:
                    return self._qmm(inp, stream[name], li, n)
                return jnp.dot(
                    inp, lp[name], preferred_element_type=jnp.float32
                )

            sg = shproj("shared_gate_proj", x, Fs)
            su = shproj("shared_up_proj", x, Fs)
            sh = act_with_mul(a.hidden_act, sg, su).astype(x.dtype)
            out = out + shproj("shared_down_proj", sh, a.hidden_size)
        return out

    def forward(
        self, params, kv_cache, mi: ModelInputs, all_hidden: bool = False,
        decode_only: bool = False,  # routes to the Pallas MLA decode kernel
    ):
        a = self.args
        h = params["embed_tokens"][mi.token_ids]
        cos, sin = self._rope_tables(mi.positions)

        tp_axis = self.parallel.tp_axis

        # Dense-stack quantized projections pass whole via closure exactly
        # like the MoE stack's (streaming at the layer offset; scan-slicing
        # stacked quant arrays would copy every byte per layer).
        dense_params = params.get("dense_layers")
        dense_stream = {}
        if self.n_dense and self.proj_quant:
            dense_stream = {
                k: v for k, v in dense_params.items()
                if isinstance(v, dict) and "zeros" in v
            }
            dense_params = {
                k: v for k, v in dense_params.items()
                if k not in dense_stream
            }

        def dense_layer(carry, xs):
            h = carry
            lp, kvc, li = xs
            h, kvc = self._attention(
                lp, h, mi, cos, sin, kvc, decode_only,
                stream=dense_stream, li=li,
            )
            x = rms_norm(h, lp["post_norm"], a.rms_norm_eps)

            def proj(name, inp, n):
                if name in dense_stream:
                    return self._qmm(inp, dense_stream[name], li, n)
                return jnp.dot(
                    inp, lp[name], preferred_element_type=jnp.float32
                )

            g = proj("gate_proj", x, a.intermediate_size)
            u = proj("up_proj", x, a.intermediate_size)
            m = act_with_mul(a.hidden_act, g, u).astype(h.dtype)
            m = proj("down_proj", m, a.hidden_size)
            if tp_axis is not None:
                m = lax.psum(m, tp_axis)
            return h + m.astype(h.dtype), kvc

        # Quantized weights do NOT ride the scan xs (slicing the stacked
        # arrays would copy every byte per layer — same rationale as
        # common.py's quant_stream); they pass whole via closure and the
        # kernels stream layer li's tiles in place: expert pairs for the
        # routed-expert kernel, projection triples for quant_matmul.
        moe_params = params.get("moe_layers")
        expert_stream = None
        proj_stream = {}
        if self.n_moe and self.moe_quant:
            expert_stream = {
                k: moe_params[k] for k in ("moe_gate", "moe_up", "moe_down")
            }
            if self.proj_quant:
                proj_stream = {
                    k: v for k, v in moe_params.items()
                    if isinstance(v, dict) and "zeros" in v
                }
            moe_params = {
                k: v for k, v in moe_params.items()
                if k not in expert_stream and k not in proj_stream
            }

        def moe_layer(carry, xs):
            h = carry
            lp, kvc, li = xs
            h, kvc = self._attention(
                lp, h, mi, cos, sin, kvc, decode_only,
                stream=proj_stream, li=li,
            )
            x = rms_norm(h, lp["post_norm"], a.rms_norm_eps)
            m = self._moe_ffn(lp, x, expert_stream, li, stream=proj_stream)
            if tp_axis is not None:
                m = lax.psum(m, tp_axis)
            return h + m.astype(h.dtype), kvc

        nd = self.n_dense
        kv_out = []
        if nd:
            h, kv_dense = lax.scan(
                dense_layer, h,
                (dense_params, kv_cache[:nd],
                 jnp.arange(nd, dtype=jnp.int32)),
            )
            kv_out.append(kv_dense)
        if self.n_moe:
            h, kv_moe = lax.scan(
                moe_layer, h,
                (moe_params, kv_cache[nd:],
                 jnp.arange(self.n_moe, dtype=jnp.int32)),
            )
            kv_out.append(kv_moe)
        new_kv = jnp.concatenate(kv_out, axis=0) if len(kv_out) > 1 else kv_out[0]

        h = rms_norm(h, params["final_norm"], a.rms_norm_eps)
        if all_hidden:
            return h, new_kv
        return h[mi.selected_idxes], new_kv

    def logits(self, params, hidden):
        a = self.args
        if a.tie_word_embeddings:
            w = params["embed_tokens"].T  # replicated
            return jnp.dot(hidden, w, preferred_element_type=jnp.float32)
        if isinstance(params["lm_head"], dict):
            return self._qmm(hidden, params["lm_head"], n=a.vocab_size)
        logits = jnp.dot(
            hidden, params["lm_head"], preferred_element_type=jnp.float32
        )
        if self.parallel.tp_axis is not None:
            logits = lax.all_gather(
                logits, self.parallel.tp_axis, axis=1, tiled=True
            )
        return logits


# ------------------------------------------------------------------- registry


@ModelRegistry.register_model_args("deepseek_v2")
def load_deepseek_v2_model_args(cfg: Dict[str, Any]) -> ModelArgs:
    return ModelArgs(
        model_type="deepseek_v2",
        dtype=hf_dtype(cfg, "bfloat16"),
        hidden_size=cfg.get("hidden_size", 5120),
        hidden_act=cfg.get("hidden_act", "silu"),
        intermediate_size=cfg.get("intermediate_size", 12288),
        n_layers=cfg.get("num_hidden_layers", 60),
        n_heads=cfg.get("num_attention_heads", 128),
        n_kv_heads=cfg.get("num_attention_heads", 128),
        vocab_size=cfg.get("vocab_size", 102400),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 10000.0),
        max_position_embeddings=cfg.get("max_position_embeddings", 4096),
        bos_token_id=cfg.get("bos_token_id", 1),
        eos_token_id=cfg.get("eos_token_id", 2),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        norm_type="rms_norm",
        q_lora_rank=cfg.get("q_lora_rank"),
        kv_lora_rank=cfg.get("kv_lora_rank", 512),
        qk_nope_head_dim=cfg.get("qk_nope_head_dim", 128),
        qk_rope_head_dim=cfg.get("qk_rope_head_dim", 64),
        v_head_dim=cfg.get("v_head_dim", 128),
        first_k_dense_replace=cfg.get("first_k_dense_replace", 0),
        n_experts=cfg.get("n_routed_experts") or 0,
        n_experts_per_token=cfg.get("num_experts_per_tok") or 0,
        moe_intermediate_size=cfg.get("moe_intermediate_size", 1407),
        n_shared_experts=cfg.get("n_shared_experts") or 0,
        norm_topk_prob=bool(cfg.get("norm_topk_prob", False)),
        routed_scaling_factor=float(cfg.get("routed_scaling_factor", 1.0)),
        topk_method=cfg.get("topk_method", "greedy"),
        n_group=cfg.get("n_group") or 0,
        topk_group=cfg.get("topk_group") or 0,
        raw=cfg,
    )


def _moe_index(first_k):
    """Map global layer index → moe-stack index (None = not a moe layer)."""

    def f(idx):
        if not idx:
            return idx
        layer = idx[0]
        if layer < first_k:
            return None
        return (layer - first_k,) + tuple(idx[1:])

    return f


def _dense_index(first_k):
    def f(idx):
        if not idx:
            return idx
        if idx[0] >= first_k:
            return None
        return idx

    return f


def _deepseek_rules(first_k: int, q_lora: Optional[int]):
    A = r"model\.layers\.(\d+)\."
    rules = [
        (r"model\.embed_tokens\.weight", "embed_tokens", False),
        (r"model\.norm\.weight", "final_norm", False),
        (r"lm_head\.weight", "lm_head", True),
    ]
    for stack, imap in (
        ("dense_layers", _dense_index(first_k)),
        ("moe_layers", _moe_index(first_k)),
    ):
        attn = [
            (A + r"input_layernorm\.weight", f"{stack}.input_norm", False, None, imap),
            (A + r"post_attention_layernorm\.weight", f"{stack}.post_norm", False, None, imap),
            (A + r"self_attn\.kv_a_proj_with_mqa\.weight", f"{stack}.kv_a", True, None, imap),
            (A + r"self_attn\.kv_a_layernorm\.weight", f"{stack}.kv_a_norm", False, None, imap),
            (A + r"self_attn\.kv_b_proj\.weight", f"{stack}.kv_b", True, None, imap),
            (A + r"self_attn\.o_proj\.weight", f"{stack}.o_proj", True, None, imap),
        ]
        if q_lora:
            attn += [
                (A + r"self_attn\.q_a_proj\.weight", f"{stack}.q_a", True, None, imap),
                (A + r"self_attn\.q_a_layernorm\.weight", f"{stack}.q_a_norm", False, None, imap),
                (A + r"self_attn\.q_b_proj\.weight", f"{stack}.q_b", True, None, imap),
            ]
        else:
            attn += [
                (A + r"self_attn\.q_proj\.weight", f"{stack}.q_proj", True, None, imap),
            ]
        rules += attn
    # dense FFN (only matches layers < first_k via index map)
    dmap = _dense_index(first_k)
    rules += [
        (A + r"mlp\.gate_proj\.weight", "dense_layers.gate_proj", True, None, dmap),
        (A + r"mlp\.up_proj\.weight", "dense_layers.up_proj", True, None, dmap),
        (A + r"mlp\.down_proj\.weight", "dense_layers.down_proj", True, None, dmap),
    ]
    mmap = _moe_index(first_k)
    rules += [
        (A + r"mlp\.gate\.weight", "moe_layers.router", True, None, mmap),
        (A + r"mlp\.experts\.(\d+)\.gate_proj\.weight", "moe_layers.moe_gate", True, None, mmap),
        (A + r"mlp\.experts\.(\d+)\.up_proj\.weight", "moe_layers.moe_up", True, None, mmap),
        (A + r"mlp\.experts\.(\d+)\.down_proj\.weight", "moe_layers.moe_down", True, None, mmap),
        (A + r"mlp\.shared_experts\.gate_proj\.weight", "moe_layers.shared_gate_proj", True, None, mmap),
        (A + r"mlp\.shared_experts\.up_proj\.weight", "moe_layers.shared_up_proj", True, None, mmap),
        (A + r"mlp\.shared_experts\.down_proj\.weight", "moe_layers.shared_down_proj", True, None, mmap),
    ]
    return rules


@ModelRegistry.register_causal_lm("deepseek_v2")
def create_deepseek_v2(args: ModelArgs, parallel, attn_impl=None) -> MLADecoderModel:
    model = MLADecoderModel(args, parallel, attn_impl)
    model.hf_weight_rules = _deepseek_rules(
        args.first_k_dense_replace, args.q_lora_rank
    )
    return model
