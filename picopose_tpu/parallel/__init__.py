"""Device-mesh parallelism: sharding layouts and collectives-by-construction.

The reference scales with NCCL DDP (PyTorch-Lightning strategy='ddp',
config/base.yaml:5-7; explicit torch.distributed in the vendored stack,
rendering/src/megapose/utils/distributed.py:37-151).  The TPU-native
equivalent is declarative: build a `jax.sharding.Mesh` over the slice, shard
the batch along the 'data' axis with NamedSharding, annotate the parameter
layout (replicated ddp / ZeRO-3 fsdp / Megatron-style tp —
picopose_tpu/parallel/shardings.py), and let XLA insert the collectives
over ICI.  No process groups, barriers or file-system weight syncs — see
picopose_tpu/parallel/mesh.py and docs/SCALING.md.
"""

from picopose_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from picopose_tpu.parallel.shardings import (
    leaf_spec,
    shard_state,
    state_shardings,
)
