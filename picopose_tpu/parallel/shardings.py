"""Parameter/optimizer sharding rules: DDP, FSDP, and tensor parallelism.

The reference trains pure DDP (config/base.yaml:5-7, PyTorch-Lightning
`strategy: 'ddp'`) and only *reserves* FSDP hooks (vision_transformer.py:89
`block_chunks`, always 0).  On TPU the same mesh that carries the data axis
can shard parameters and optimizer state too, so we provide the scaling
modes the reference never finished, as pure sharding annotations — the
train step itself (picopose_tpu/train/step.py) is unchanged; XLA's SPMD
partitioner inserts the collectives:

  * ``ddp``   — parameters/optimizer replicated, batch over 'data'
                (gradient all-reduce; the reference's NCCL DDP semantics).
  * ``fsdp``  — every large parameter leaf sharded along its largest
                mesh-divisible axis over 'data' (ZeRO-3: all-gather
                parameters in forward/backward, reduce-scatter gradients,
                sharded AdamW moments).  Cuts per-chip state memory by the
                data-axis size; exact same numerics as ddp.
  * ``tp``    — Megatron-style tensor parallelism over the 'model' axis
                for the ViT trunk: qkv/fc1/w12 kernels column-sharded,
                proj/fc2/w3 kernels row-sharded.  Propagated by GSPMD from
                the parameter annotations alone; no model code changes.
  * ``fsdp_tp`` — both (2-D sharding: 'data' × 'model').

Sharding never changes results beyond float reduction order —
tests/test_fsdp.py pins all modes against the replicated step.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODES = ("ddp", "fsdp", "tp", "fsdp_tp")

# Megatron split: column-parallel into the nonlinearity, row-parallel out
# of it.  Keyed on the flax param path; the same module names appear inside
# optax moment trees (mu/nu are params-shaped dicts), so one rule table
# covers both.  Matches the ViT blocks (dinov2.py qkv/proj/fc1/fc2/w12/w3)
# AND the stage-2 MLP head (affine_head.py fc1->fc2) — the same consecutive
# column->row pattern, intentionally included.
#   kernel shapes are (in, out) for nn.Dense.
_TP_COL = re.compile(r"(qkv|fc1|w12)/(kernel|bias)$")
_TP_ROW = re.compile(r"(proj|fc2|w3)/kernel$")

# Leaves smaller than this stay replicated under fsdp: the all-gather
# latency of many tiny transfers costs more than the bytes save.
_FSDP_MIN_SIZE = 1 << 14


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def _tp_spec(pstr: str, shape: tuple[int, ...], n_model: int):
    """Megatron spec over 'model' for one leaf, or None if not a TP leaf."""
    m = _TP_COL.search(pstr)
    if m is not None:
        # column parallel: shard the OUTPUT dim (last) of kernel and bias
        if shape[-1] % n_model != 0:
            return None
        return [None] * (len(shape) - 1) + ["model"]
    if _TP_ROW.search(pstr) is not None and len(shape) >= 2:
        # row parallel: shard the INPUT dim (first); bias stays replicated
        if shape[0] % n_model != 0:
            return None
        return ["model"] + [None] * (len(shape) - 1)
    return None


def _fsdp_axis(spec: list, shape: tuple[int, ...], n_data: int) -> list:
    """Add 'data' on the largest still-free divisible axis (ZeRO-3)."""
    if int(np.prod(shape)) < _FSDP_MIN_SIZE:
        return spec
    free = [
        i
        for i, d in enumerate(shape)
        if spec[i] is None and d % n_data == 0 and d >= n_data
    ]
    if not free:
        return spec
    best = max(free, key=lambda i: shape[i])
    spec = list(spec)
    spec[best] = "data"
    return spec


def leaf_spec(
    pstr: str, shape: tuple[int, ...], mode: str, n_data: int, n_model: int
) -> P:
    """PartitionSpec for one parameter-shaped leaf."""
    if mode not in MODES:
        raise ValueError(f"unknown parallel mode {mode!r}; one of {MODES}")
    spec: list = [None] * len(shape)
    if mode in ("tp", "fsdp_tp") and n_model > 1:
        tp = _tp_spec(pstr, shape, n_model)
        if tp is not None:
            spec = tp
    if mode in ("fsdp", "fsdp_tp") and n_data > 1:
        spec = _fsdp_axis(spec, shape, n_data)
    while spec and spec[-1] is None:  # canonical form: no trailing Nones
        spec = spec[:-1]
    return P(*spec)


def state_shardings(mesh: Mesh, state: Any, mode: str = "ddp") -> Any:
    """NamedSharding pytree for a TrainState (params, moments, stats...).

    Works on the state itself or on a `jax.eval_shape` skeleton — only
    `.shape` is read.  Scalars and non-array leaves come back replicated.
    """
    n_data = mesh.shape.get("data", 1)
    n_model = mesh.shape.get("model", 1)

    def one(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        if not shape:
            return NamedSharding(mesh, P())
        return NamedSharding(
            mesh, leaf_spec(_path_str(path), shape, mode, n_data, n_model)
        )

    return jax.tree_util.tree_map_with_path(one, state)


def shard_state(state: Any, mesh: Mesh, mode: str = "ddp") -> Any:
    """Place a host/replicated TrainState onto the mesh under `mode`."""
    return jax.device_put(state, state_shardings(mesh, state, mode))
