"""Parallelism configuration.

TPU-native equivalent of the reference's ParallelArgs
(reference: src/model_parallel/parallel_args.h:10). Instead of rank/world_size
+ NCCL process groups, we carry mesh axis names; collectives are XLA
psum/all_gather emitted inside shard_map over the ICI fabric.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class ParallelConfig:
    # Mesh axis name for tensor parallelism (None = single device).
    tp_axis: Optional[str] = None
    # Mesh axis name for data parallelism (replica groups), optional.
    dp_axis: Optional[str] = None
    # Mesh axis name for expert parallelism (MoE), optional.
    ep_axis: Optional[str] = None
    # Sizes (1 when axis unused) — static, needed for weight partitioning.
    tp_size: int = 1
    dp_size: int = 1
    ep_size: int = 1
    # Megatron-style sequence parallelism over the tp axis: norms/residuals/
    # embedding are sharded over the TOKEN dim; activations are all_gathered
    # before column-parallel projections and reduce_scattered (psum_scatter)
    # after row-parallel ones. Same bytes on the wire as plain TP's psum
    # (AG + RS = AR) but the elementwise/norm HBM traffic drops by tp_size —
    # a long-prefill win. Dense models only (MoE/LoRA paths keep plain TP).
    sp: bool = False

    @property
    def is_parallel(self) -> bool:
        return self.tp_size > 1 or self.dp_size > 1 or self.ep_size > 1
