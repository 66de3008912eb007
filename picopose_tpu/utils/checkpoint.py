"""Checkpoint persistence via orbax (the reference uses PyTorch-Lightning's
ModelCheckpoint at run_train.py:99-102 and Lite.load_from_checkpoint at
run_test.py:265-272).

Layout: <log_dir>/checkpoints/<step>/ managed by orbax CheckpointManager
(keeps every step like the reference's save_top_k=-1).  Multi-host: orbax
writes from process 0 and synchronizes — this replaces the reference's
file-system model sync (megapose/utils/distributed.py:47-77).

Also exposes `load_any`: a torch .ckpt/.pth path is transparently ported
through utils/torch_port.py so reference checkpoints work directly.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def manager(log_dir: str, keep: int | None = None) -> ocp.CheckpointManager:
    path = os.path.abspath(os.path.join(log_dir, "checkpoints"))
    os.makedirs(path, exist_ok=True)
    return ocp.CheckpointManager(
        path,
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save(mgr: ocp.CheckpointManager, step: int, state: Any) -> None:
    mgr.save(step, args=ocp.args.StandardSave(state))


def restore(mgr: ocp.CheckpointManager, step: int | None, template: Any) -> Any:
    step = mgr.latest_step() if step is None else step
    return mgr.restore(step, args=ocp.args.StandardRestore(template))


def load_any(path: str, depth: int = 24) -> dict:
    """Load model variables from either an orbax dir or a torch checkpoint.

    Returns a flax variables dict ({'params': ..., 'batch_stats': ...}).
    """
    if os.path.isdir(path):
        # a CheckpointManager step dir nests the payload under 'default/'
        # (StandardCheckpointer wants the item dir itself)
        if not os.path.exists(os.path.join(path, "_METADATA")) and os.path.isdir(
            os.path.join(path, "default")
        ):
            path = os.path.join(path, "default")
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    # torch checkpoint (reference .ckpt / .pth): port it
    from picopose_tpu.utils.torch_port import load_torch_checkpoint, port_picopose

    return port_picopose(load_torch_checkpoint(path), depth=depth)
