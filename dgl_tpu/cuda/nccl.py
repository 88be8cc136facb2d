"""``dgl.cuda.nccl`` compatibility: sparse all-to-all over the device
mesh (reference ``python/dgl/cuda/nccl.py:7,98``).  Must run inside
``shard_map`` over a Mesh — see ``dgl_tpu.parallel.collectives`` for the
mesh-level entry points (``push_sharded`` / ``pull_sharded``)."""
from ..parallel.collectives import (  # noqa: F401
    sparse_all_to_all_push,
    sparse_all_to_all_pull,
    push_sharded,
    pull_sharded,
)

__all__ = ["sparse_all_to_all_push", "sparse_all_to_all_pull",
           "push_sharded", "pull_sharded"]
