"""Training losses for the three stages.

Equivalent of utils/loss_utils.py, static-shape style: the reference
compacts valid correspondences with boolean gathers (torch_utils.py:257-284);
here validity rides along as masks and enters the losses as -inf logits or
weighted means.

Weights / settings (all from the reference):
  * stage 1: infoNCE over matched patch features, tau=0.1 (loss_utils.py:145-173);
  * stage 2: L1 translation (GT / 14 px), L2 log-scale (clamp 5e-3),
    geodesic in-plane with eps 1e-6 (loss_utils.py:135-183);
  * stage 3 per level: BCE-with-logits certainty (weight 1) + masked L1 flow
    (weight 0.1, max_flow 400) (loss_utils.py:121-127, 185-203);
  * total: sum of all terms, clamped at 100 (loss_utils.py:15-22).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from picopose_tpu.geom.grids import pixel_coords_grid
from picopose_tpu.geom.rotation import cos_sin
from picopose_tpu.ops.matching import l2_normalize


def info_nce_loss(
    src_feat: jnp.ndarray,   # (B, h, w, C) template stage-1 features
    tar_feat: jnp.ndarray,   # (B, h, w, C) query features
    src_pts: jnp.ndarray,    # (B, 64, 64, 2) src grid, patch units (of 64-grid)
    tar_pts: jnp.ndarray,    # (B, 64, 64, 2) reprojected, patch units
    valid: jnp.ndarray,      # (B, 64, 64)
    tau: float = 0.1,
) -> jnp.ndarray:
    """Symmetric-label infoNCE over matched patch feature pairs.

    The reference downsamples the 64-grid correspondences to the 16-grid
    (nearest, i.e. stride-4 sampling), gathers features at the integer patch
    coords and builds an (M, M) logit matrix over the valid pairs
    (loss_utils.py:145-173).  We keep all B*h*w slots and mask invalid
    columns with -inf / invalid rows out of the mean.
    """
    B, h, w, C = src_feat.shape
    G = src_pts.shape[1]
    stride = G // h
    # stride-4 nearest downsample == torch F.interpolate(mode='nearest') here
    sp = src_pts[:, ::stride, ::stride] * (h / G)
    tp = tar_pts[:, ::stride, ::stride] * (h / G)
    v = valid[:, ::stride, ::stride]

    def gather(feat, pts):
        xi = jnp.clip(pts[..., 0].astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(pts[..., 1].astype(jnp.int32), 0, h - 1)
        flat = feat.reshape(B, h * w, C)
        idx = (yi * w + xi).reshape(B, h * w)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, hw, C)

    q = l2_normalize(gather(src_feat, sp).astype(jnp.float32)).reshape(-1, C)
    r = l2_normalize(gather(tar_feat, tp).astype(jnp.float32)).reshape(-1, C)
    m = v.reshape(-1)

    logits = jnp.einsum("ic,jc->ij", q, r, precision="highest") / tau
    logits = jnp.where(m[None, :], logits, -jnp.inf)  # only valid negatives
    logp = jax.nn.log_softmax(logits, axis=1)
    diag = jnp.diagonal(logp)
    n = jnp.maximum(m.sum(), 1)
    return -(jnp.where(m, diag, 0.0).sum()) / n


def stage2_loss(
    pred_translation, pred_scale, pred_inplane,
    gt_translation, gt_scale, gt_inplane_angle,
    trans_scale: float = 14.0,
):
    """Returns (loss_2d_trans, loss_scale, loss_inplane)."""
    l_trans = jnp.abs(pred_translation - gt_translation / trans_scale).mean()
    l_scale = jnp.mean(
        (jnp.log(jnp.clip(pred_scale, 5e-3)) - jnp.log(gt_scale)) ** 2
    )
    gt_cs = cos_sin(gt_inplane_angle)
    dot = jnp.clip((pred_inplane * gt_cs).sum(-1), -1 + 1e-6, 1 - 1e-6)
    l_inplane = jnp.arccos(dot).mean()
    return l_trans, l_scale, l_inplane


def flow_level_loss(
    pred_flow: jnp.ndarray,       # (B, H, W, 2)
    pred_certainty: jnp.ndarray,  # (B, H, W, 1) logits
    tar_pts: jnp.ndarray,         # (B, 64, 64, 2) patch units of the 64-grid
    valid: jnp.ndarray,           # (B, 64, 64)
    flow_weight: float = 0.1,
    cert_weight: float = 1.0,
    max_flow: float = 400.0,
):
    """One level of the stage-3 loss (loss_utils.py:185-203).

    GT flow: nearest-downsampled tar grid scaled to the level resolution,
    zeroed outside validity, minus the identity grid."""
    B, H, W, _ = pred_flow.shape
    G = tar_pts.shape[1]
    stride = G // H
    gt_cert = valid[:, ::stride, ::stride]
    gt_tar = tar_pts[:, ::stride, ::stride] * (H / G)
    grid = pixel_coords_grid(H, W)
    gt_flow = gt_tar * gt_cert[..., None] - grid

    # certainty BCE with logits
    z = pred_certainty[..., 0]
    y = gt_cert.astype(jnp.float32)
    bce = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    l_cert = cert_weight * bce.mean()

    # RAFT-style masked L1 (loss_utils.py:25-40)
    mag = jnp.sqrt((gt_flow**2).sum(-1))
    w = ((y >= 0.5) & (mag < max_flow)).astype(jnp.float32)
    l1 = jnp.abs(pred_flow - gt_flow).sum(-1)
    l_flow = flow_weight * (w * l1).sum() / (w.sum() + 1e-10)
    return l_flow, l_cert


def total_loss(loss_dict: dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Sum of every term, clamped at 100 (Loss, loss_utils.py:15-22)."""
    return jnp.clip(sum(loss_dict.values()), None, 100.0)
