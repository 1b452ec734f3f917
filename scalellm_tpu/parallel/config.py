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

    @property
    def is_parallel(self) -> bool:
        return self.tp_size > 1 or self.dp_size > 1 or self.ep_size > 1
