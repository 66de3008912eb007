"""Multi-host (multi-slice) initialization and helpers.

TPU-native replacement for the reference's NCCL process-group setup and
file-system-based weight sync (rendering/src/megapose/utils/distributed.py:
37-151, SURVEY.md §2.3):

  * `initialize()` wraps jax.distributed.initialize — coordinator discovery
    is handled by the TPU runtime, no MASTER_ADDR plumbing;
  * metric reduction is jnp mean/psum inside the jitted step (replacing
    `reduce_dict`);
  * checkpoint writes go through orbax (process 0 + barrier), replacing
    rank-0 tmp-file sync;
  * `broadcast_host_data` replaces the reference's config file-sync: pushes
    a process-0 pytree to all hosts through a replicated device array.
"""

from __future__ import annotations

import jax
import numpy as np


def is_initialized() -> bool:
    """Whether the JAX distributed client has been brought up."""
    try:
        from jax._src.distributed import global_state
    except ImportError:  # pragma: no cover - jax internals moved
        return False
    return getattr(global_state, "client", None) is not None


def initialize(**kwargs) -> None:
    """Initialize the JAX distributed runtime.

    Two entry modes, mirroring the reference's init_distributed_mode
    (megapose/utils/distributed.py:144-151) without MASTER_ADDR plumbing:

      * zero-arg: TPU-pod auto-detect (coordinator discovered by the
        runtime). Failure here means a genuinely single-process
        environment, which is fine — swallow it.
      * explicit kwargs (coordinator_address=, num_processes=,
        process_id=): the caller is doing multi-host bring-up on
        CPU/GPU or a custom topology. Errors are REAL configuration
        problems and must propagate.
    """
    if is_initialized():
        return
    if kwargs:
        jax.distributed.initialize(**kwargs)
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process environments without auto-detectable coordinator
        pass


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def broadcast_host_data(tree, mesh) -> object:
    """Broadcast a process-0 numpy pytree to every host.

    Equivalent role to the reference's sync_config/sync_model
    (megapose/utils/distributed.py:47-77), but via a collective instead of a
    shared filesystem.
    """
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return tree
    return multihost_utils.broadcast_one_to_all(tree)


def all_hosts_barrier(name: str = "barrier") -> None:
    """Cross-host barrier (reference: torch.distributed.barrier)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
