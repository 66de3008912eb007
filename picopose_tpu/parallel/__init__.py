"""Device-mesh parallelism: sharding layouts and collectives-by-construction.

The reference scales with NCCL DDP (PyTorch-Lightning strategy='ddp',
config/base.yaml:5-7; explicit torch.distributed in the vendored stack,
rendering/src/megapose/utils/distributed.py:37-151).  The TPU-native
equivalent is declarative: build a `jax.sharding.Mesh` over the slice, shard
the batch along the 'data' axis with NamedSharding, keep parameters
replicated, and let XLA insert the gradient all-reduces over ICI.  No
process groups, barriers or file-system weight syncs — see
picopose_tpu/parallel/mesh.py.
"""

from picopose_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
