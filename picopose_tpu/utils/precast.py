"""Pre-cast bf16-consumed inference weights to bf16 in HBM.

flax modules declared with ``dtype=bfloat16`` store their parameters in
f32 and cast them to bf16 *inside* the consuming fusion (``promote_dtype``).
On TPU that shows up in the device trace as a per-tile f32->bf16 convert on
the VPU feeding every weight load: the ViT MLP fusions read 2x the weight
bytes from HBM and stall the MXU behind the convert (measured on the ViT-L
eval program: the fc1/fc2 fusions ran at ~55% of their bf16-weight form).

Casting those parameters to bf16 ahead of time is **bitwise identical**
for every parameter the model consumes at bf16, because flax rounds them
to bf16 at use anyway:

  * Dense / Conv ``kernel`` + ``bias`` (promote_dtype before the matmul) —
    the ViT qkv/proj/fc1/fc2/w12/w3, patch_embed, every DPT and flow conv
    (flow.py's fused conv helper casts explicitly: ``kernel.astype(x.dtype)``);
  * LayerScale ``gamma`` and the ``cls_token`` (``.astype(x.dtype)`` at use).

NOT pre-cast (consumed in f32 math — casting would change numerics):

  * ``pos_embed``: interpolated with f32 ``precision='highest'`` einsums
    (models/dinov2.py:188-193);
  * LayerNorm / BatchNorm / GroupNorm ``scale``/``bias`` and all
    ``batch_stats``: flax normalization computes ``x - mean`` and
    ``rsqrt(var + eps) * scale`` in f32 (stats/params promote the bf16
    activations UP to f32; flax _normalize casts only the final result);
  * the affine regressor: stage 2 runs entirely in f32
    (models/picopose.py:75-78).

Eval/serving only — training params must stay f32 for the optimizer.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp

# submodules whose activations run in compute_dtype during inference
_BF16_SUBMODULES = ("feature_extractor", "dpt_head", "flow_decoder")


def _cast_tree(tree: Mapping[str, Any], dtype, skip: frozenset[str]):
    has_kernel = "kernel" in tree
    out = {}
    for name, leaf in tree.items():
        if name in skip:
            out[name] = leaf
        elif isinstance(leaf, Mapping):
            out[name] = _cast_tree(leaf, dtype, skip)
        elif (
            (has_kernel and name in ("kernel", "bias"))
            or name in ("gamma", "cls_token")
        ) and getattr(leaf, "dtype", None) == jnp.float32:
            out[name] = leaf.astype(dtype)
        else:
            out[name] = leaf
    return out


def precast_inference_params(
    variables: Mapping[str, Any], dtype=jnp.bfloat16
) -> dict[str, Any]:
    """Return ``variables`` with bf16-consumed weights stored as ``dtype``.

    Bitwise-identical inference outputs (see module docstring), half the
    weight HBM traffic, no VPU converts in the matmul fusions.  Apply only
    when the model's ``compute_dtype`` matches ``dtype``.
    """
    out = dict(variables)
    params = dict(variables["params"])
    for sub in _BF16_SUBMODULES:
        if sub in params:
            params[sub] = _cast_tree(
                params[sub], dtype, skip=frozenset(("pos_embed",))
            )
    out["params"] = params
    return out
