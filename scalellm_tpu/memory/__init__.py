from scalellm_tpu.memory.block import Block
from scalellm_tpu.memory.block_allocator import BlockAllocator
from scalellm_tpu.memory.block_manager import BlockManager, BlockManagerOptions
from scalellm_tpu.memory.prefix_cache import PrefixCache

__all__ = [
    "Block",
    "BlockAllocator",
    "BlockManager",
    "BlockManagerOptions",
    "PrefixCache",
]
