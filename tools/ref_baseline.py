"""Measured + analytic bounds for the reference's per-crop throughput.

BASELINE.md demands a MEASURED reference number before parity claims; no
CUDA hardware exists here, so this script pins down what is measurable:

1. CPU head-to-head on BASELINE eval config (1) — "single LM-O image,
   42-view coarse matching + pose recovery":  the ACTUAL reference code
   (/root/reference/utils/matching.py::matching_templates, torch CPU, and
   utils/pose_recovery.py::pose_recovery_ransac_pnp, OpenCV EPnP RANSAC)
   vs our jax CPU equivalents at identical shapes.  Same host, same
   silicon -> a hardware-neutral relative-efficiency measurement.

2. Analytic single-GPU bound for the reference's FAITHFUL eval config
   (ViT-L, 162 views, 5 hyp): per-crop FLOPs from the model dims, divided
   by an optimistic effective GPU rate.  This UPPER-bounds the reference
   (it ignores its serial CPU RANSAC, host<->device copies per hypothesis
   and batch-4 launch overheads), so crops_per_sec/bound is a LOWER bound
   on our true speedup.

Run: python tools/ref_baseline.py   (CPU-only; ~2 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def time_ref_matching(B=1, N=42, C=1024, H=16, iters=5):
    sys.path.insert(0, REF)
    import torch

    from utils.matching import matching_templates

    torch.manual_seed(0)
    src = torch.randn(B, N, C, H, H)
    tar = torch.randn(B, C, H, H)
    src_m = (torch.rand(B, N, 224, 224) > 0.3).float()
    tar_m = (torch.rand(B, 224, 224) > 0.3).float()
    matching_templates(src, tar, src_m, tar_m, topk=5)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        matching_templates(src, tar, src_m, tar_m, topk=5)
    return (time.perf_counter() - t0) / iters


def time_ref_pnp(n_pts=4096, iters=5):
    sys.path.insert(0, REF)
    import torch

    from utils.pose_recovery import pose_recovery_ransac_pnp

    torch.manual_seed(0)
    g = int(np.sqrt(n_pts))
    # channel-first coordinate maps + (N, 2) patch indices, the shapes
    # run_test.py:173-176 feeds per instance per hypothesis
    tar_pts_2d = torch.rand(2, g, g) * 640
    src_pts_3d = torch.rand(3, g, g) * 0.1
    tar_pts = torch.randint(0, g, (n_pts, 2))
    src_pts = torch.randint(0, g, (n_pts, 2))
    K = torch.tensor(
        [[572.4114, 0, 320.0], [0, 573.57043, 240.0], [0, 0, 1.0]]
    )
    pose = torch.eye(4)
    pose[2, 3] = 0.5
    pose_recovery_ransac_pnp(tar_pts_2d, src_pts_3d, K, pose, tar_pts, src_pts)
    t0 = time.perf_counter()
    for _ in range(iters):
        pose_recovery_ransac_pnp(
            tar_pts_2d, src_pts_3d, K, pose, tar_pts, src_pts
        )
    return (time.perf_counter() - t0) / iters


def time_ours_matching(B=1, N=42, C=1024, H=16, iters=5):
    import jax
    import jax.numpy as jnp

    from picopose_tpu.ops.matching import match_templates

    rng = np.random.default_rng(0)
    bank = jnp.asarray(rng.normal(size=(N, H, H, C)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, H, H, C)), jnp.float32)
    qm = jnp.asarray(rng.random((B, 224, 224)) > 0.3, jnp.float32)
    fn = jax.jit(lambda b, f, m: match_templates(b, f, m, topk=5, impl="xla"))
    jax.block_until_ready(fn(bank, q, qm))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(bank, q, qm))
    return (time.perf_counter() - t0) / iters


def time_ours_pnp(n_pts=4096, iters=3):
    import jax
    import jax.numpy as jnp

    from picopose_tpu.ops.pnp import ransac_pnp

    rng = np.random.default_rng(0)
    p3 = jnp.asarray(rng.normal(size=(1, n_pts, 3)), jnp.float32) * 0.05
    p2 = jnp.asarray(rng.uniform(0, 640, (1, n_pts, 2)), jnp.float32)
    K = jnp.asarray(
        [[[572.4114, 0, 320.0], [0, 573.57043, 240.0], [0, 0, 1.0]]],
        jnp.float32,
    )
    v = jnp.asarray(rng.random((1, n_pts)) > 0.5)
    key = jax.random.PRNGKey(0)
    fn = jax.jit(lambda a, b, c, d: ransac_pnp(a, b, c, d, key, iters=150))
    jax.block_until_ready(fn(p3, p2, K, v))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(p3, p2, K, v))
    return (time.perf_counter() - t0) / iters


def analytic_gpu_bound():
    """Per-crop FLOPs of the reference's faithful eval (its own dataflow) /
    optimistic GPU rate -> upper-bound crops/s for a single modern GPU."""
    d, depth, tokens = 1024, 24, 257
    vit = depth * (tokens * 12 * d * d * 2 + 4 * tokens * tokens * d)
    # reference re-runs the full ViT per hypothesis (model/picopose.py:78 +
    # run_test.py:130): 1 query + 5 hypothesis passes
    vit_total = 6 * vit
    # stage-3 convs per hypothesis stream (MotionEncoder+XHeads+proj at
    # 16/32/64 grids, ~9.1 MMAC/px summed over levels) + DPT (~2 MMAC/px
    # at the 64-grid equivalent), both run per hypothesis for template AND
    # query sides in the reference
    px = 16 * 16 + 32 * 32 + 64 * 64
    stage3 = 5 * (9.1e6 * px * 2 + 2 * 2.0e6 * 64 * 64 * 2)
    matching = 162 * (256 * 256 * 1024 * 2)
    per_crop = vit_total + stage3 + matching
    # optimistic: A100-class 312 TFLOP/s fp16 at 50% MFU, zero host time
    bound = 312e12 * 0.5 / per_crop
    return per_crop, bound


def main():
    per_crop, bound = analytic_gpu_bound()
    print("measuring...", flush=True)
    out = {
        "ref_matching_42v_cpu_ms": round(time_ref_matching() * 1e3, 2),
        "ours_matching_42v_cpu_ms": round(time_ours_matching() * 1e3, 2),
        "ref_pnp_cv2_cpu_ms": round(time_ref_pnp() * 1e3, 2),
        "ours_pnp_cpu_ms": round(time_ours_pnp() * 1e3, 2),
        "ref_flops_per_crop": f"{per_crop:.3e}",
        "ref_gpu_upper_bound_crops_per_sec": round(bound, 1),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
