"""End-to-end demo with zero external data.

Renders a cube's template bank with the native C++ rasterizer, renders two
"scene" views of the same cube, then runs the full three-stage pipeline
(matching -> affine -> flow -> on-device RANSAC-PnP) with a randomly
initialized backbone and reports pose errors against the known ground truth.

With random weights the neural stages carry no signal — the demo's purpose
is to show the complete data contract and runtime path working hermetically:

    make -C native && python examples/synthetic_demo.py

For a meaningful pose, load a ported reference checkpoint:

    python examples/synthetic_demo.py --checkpoint /path/to/picopose.ckpt
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--views", type=int, default=42)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from picopose_tpu.data.bop import load_template_views
    from picopose_tpu.data.crops import (
        crop_and_normalize_rgb, crop_mask, crop_matrix, grid_pts2d,
        mask_square_bbox,
    )
    from picopose_tpu.eval.metrics import pose_summary
    from picopose_tpu.eval.pipeline import build_bank, run_batch_jit
    from picopose_tpu.models import PicoPose
    from picopose_tpu.models.dinov2 import VIT_CONFIGS
    from picopose_tpu.native.renderer import (
        TEMPLATES_K, load_ply, render_object_bank, render_views,
    )
    from tests.test_native import make_cube_ply

    tmp = tempfile.mkdtemp(prefix="picopose_demo_")
    cad = os.path.join(tmp, "obj_000001.ply")
    make_cube_ply(cad, size=60.0)
    print(f"[demo] rendering a {args.views}-view template bank -> {tmp}")
    render_object_bank(cad, os.path.join(tmp, "bank"), level=0, obj_id=1)

    # ground-truth scene view
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = Rotation.from_euler("xyz", [0.5, 0.2, 0.9]).as_matrix()
    gt[:3, 3] = [15.0, -8.0, 420.0]  # mm
    verts, colors, faces = load_ply(cad)
    rgba, depth = render_views(verts, colors, faces, gt[None], TEMPLATES_K)
    mask = (rgba[0, :, :, 3] > 0).astype(np.float32)
    bbox = mask_square_bbox(mask)
    M = crop_matrix(bbox, 224)

    model = PicoPose()
    if args.checkpoint:
        from picopose_tpu.utils.checkpoint import load_any

        variables = load_any(
            args.checkpoint, depth=VIT_CONFIGS[model.vit_type].depth
        )
    else:
        print("[demo] random weights (structure demo only)")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
            jnp.ones((1, 224, 224)), True,
        )

    tem = load_template_views(os.path.join(tmp, "bank"), 1, n_views=args.views)
    print(f"[demo] building the on-device bank ({args.views} views, 4 levels + DPT)")
    bank = build_bank(
        model, variables,
        jnp.asarray(tem["tem_rgb"]), jnp.asarray(tem["tem_mask"]),
        jnp.asarray(tem["tem_pts3d"]), jnp.asarray(tem["tem_pose"]),
        jnp.asarray(tem["tem_K"]), jnp.asarray(tem["tem_M"]),
    )
    batch = {
        "real_rgb": jnp.asarray(
            crop_and_normalize_rgb(rgba[0, :, :, :3], bbox, 224)
        )[None],
        "real_mask": jnp.asarray(crop_mask(mask, bbox, 224))[None],
        "real_M": jnp.asarray(M)[None],
        "real_K": jnp.asarray(TEMPLATES_K)[None],
        "real_pts2d": jnp.asarray(grid_pts2d(M))[None],
    }
    print("[demo] running the jitted pipeline (compile on first call)")
    out = run_batch_jit(model, variables, batch, bank, jax.random.PRNGKey(0))
    R = np.asarray(out.R[0, 0])
    t = np.asarray(out.t[0, 0]) * 1000.0  # -> mm (bank poses are mm/1000)
    summary = pose_summary(R, t, gt[:3, :3], gt[:3, 3])
    print(f"[demo] best-hypothesis inlier ratio: {float(out.inlier_ratio[0, 0]):.3f}")
    print(f"[demo] pose error vs GT: {summary}")
    print("[demo] done — pipeline executed end-to-end.")


if __name__ == "__main__":
    main()
