"""Template bank rendering entry point (native C++ rasterizer).

Equivalent of the reference's offline toolchain entry
(rendering/scripts/render_bop_templates.py): render icosphere-viewpoint
RGBA + depth template banks for every CAD model of a BOP dataset, in the
reference bank layout.  No Panda3D/Blender — native/rasterizer.cpp does the
rendering with thread parallelism, orchestrated in-process.

Usage:
    python render_templates.py --models_dir data/BOP/lmo/models \
        --out_dir data/templates/lmo [--level 1] \
        [--pose_table path/to/obj_poses_level1.npy]
"""

from __future__ import annotations

import argparse
import glob
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models_dir", required=True, help="dir of obj_XXXXXX.ply")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--level", type=int, default=1, help="icosphere level (0/1/2)")
    p.add_argument("--pose_table", default=None,
                   help="external (N,4,4) obj pose table .npy (for ordering "
                        "compat with reference-rendered banks)")
    args = p.parse_args()

    import numpy as np

    from picopose_tpu.native.renderer import render_object_bank

    table = np.load(args.pose_table) if args.pose_table else None
    cads = sorted(glob.glob(os.path.join(args.models_dir, "obj_*.ply")))
    if not cads:
        raise SystemExit(f"no obj_*.ply under {args.models_dir}")
    for cad in cads:
        t0 = time.perf_counter()
        poses = render_object_bank(cad, args.out_dir, args.level, table)
        print(f"{os.path.basename(cad)}: {len(poses)} views "
              f"in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
