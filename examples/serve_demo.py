"""Serving-API demo with zero external data.

Renders a cube template bank with the native C++ rasterizer, spins up a
`PoseEstimator`, registers the object, and estimates poses for detections
on freshly rendered frames — the per-frame loop a production service runs
(picopose_tpu/serve.py).  Also demonstrates bank persistence: the second
estimator loads the precomputed bank from disk instead of re-running the
backbone.

With random weights the poses are meaningless; pass --checkpoint for a
ported reference model:

    make -C native && python examples/serve_demo.py [--checkpoint ckpt]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--views", type=int, default=42)
    ap.add_argument("--vit", default="dinov2_vits14")
    args = ap.parse_args()

    import numpy as np
    from scipy.spatial.transform import Rotation

    from picopose_tpu.native import available
    from picopose_tpu.native.renderer import (
        load_ply, render_object_bank, render_views,
    )
    from picopose_tpu.serve import PoseEstimator
    from tests.test_native import make_cube_ply

    if not available():
        raise SystemExit("build the rasterizer first: make -C native")

    taps = {
        "dinov2_vitl14": (5, 11, 17, 23),
        "dinov2_vits14": (1, 3, 5, 7),
    }[args.vit]
    K = np.array(
        [[572.4114, 0, 320.0], [0, 573.57043, 240.0], [0, 0, 1.0]], np.float32
    )

    with tempfile.TemporaryDirectory() as root:
        cad = os.path.join(root, "obj_000001.ply")
        make_cube_ply(cad, size=60.0)
        bank_dir = os.path.join(root, "bank")
        render_object_bank(cad, bank_dir, level=0, obj_id=1)

        est = PoseEstimator(
            checkpoint=args.checkpoint,
            vit_type=args.vit,
            blocks_to_take=taps,
            compute_dtype="float32",
            hyp=2,
            n_template_view=args.views,
            pnp_iters=50,
            max_batch=4,
        )
        t0 = time.perf_counter()
        est.register_object(1, bank_dir)
        print(f"bank built in {time.perf_counter() - t0:.1f}s "
              f"({args.views} views)")

        verts, colors, faces = load_ply(cad)
        for frame in range(3):
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = Rotation.from_euler(
                "xyz", [0.3 * frame, 0.2, 0.5]
            ).as_matrix()
            T[:3, 3] = [10.0, -5.0, 450.0 + 30 * frame]
            rgba, _ = render_views(
                verts, colors, faces, T[None], K
            )
            rgb = rgba[0][..., :3]
            mask = (rgba[0][..., 3] > 0).astype(np.uint8)

            t0 = time.perf_counter()
            (res,) = est.estimate(rgb, K, [{"obj_id": 1, "mask": mask}])
            dt = time.perf_counter() - t0
            gt_t = T[:3, 3] / 1000.0  # mm -> m
            t_err = float(np.linalg.norm(res.t - gt_t))
            print(
                f"frame {frame}: {dt * 1000:.0f} ms  score={res.score:.2f} "
                f"success={res.success}  |t - t_gt|={t_err * 100:.1f} cm"
            )

        # bank persistence: a fresh estimator skips the backbone pass
        bank_cache = os.path.join(root, "banks")
        est.save_banks(bank_cache)
        est2 = PoseEstimator(
            checkpoint=args.checkpoint, vit_type=args.vit,
            blocks_to_take=taps, compute_dtype="float32",
            hyp=2, n_template_view=args.views, pnp_iters=50, max_batch=4,
        )
        t0 = time.perf_counter()
        objs = est2.load_banks(bank_cache)
        print(
            f"bank reloaded from disk in {time.perf_counter() - t0:.2f}s: "
            f"objects={objs}"
        )


if __name__ == "__main__":
    main()
