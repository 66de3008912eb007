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
    p.add_argument("--models_dir", help="dir of obj_XXXXXX.ply (BOP layout)")
    p.add_argument("--models_json", default=None,
                   help="GSO/ShapeNet-style models json: a list of "
                        "{'obj_id': int, 'cad_path'|'ply_path': str} entries "
                        "(render_gso_templates.py analogue)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--level", type=int, default=1, help="icosphere level (0/1/2)")
    p.add_argument("--pose_table", default=None,
                   help="external (N,4,4) obj pose table .npy (for ordering "
                        "compat with reference-rendered banks)")
    p.add_argument("--start", type=int, default=0,
                   help="first model index (cluster-sharding like "
                        "render_shapenet_templates.py)")
    p.add_argument("--end", type=int, default=-1, help="one-past-last index")
    args = p.parse_args()

    import numpy as np

    from picopose_tpu.native.renderer import render_object_bank

    table = np.load(args.pose_table) if args.pose_table else None
    jobs: list[tuple[str, int | None]] = []
    if args.models_json:
        import json

        with open(args.models_json) as f:
            entries = json.load(f)
        if isinstance(entries, dict):
            entries = list(entries.values())
        for e in entries:
            path = e.get("cad_path") or e.get("ply_path") or e.get("path")
            jobs.append((path, int(e["obj_id"])))
    else:
        if not args.models_dir:
            raise SystemExit("need --models_dir or --models_json")
        for cad in sorted(glob.glob(os.path.join(args.models_dir, "obj_*.ply"))):
            jobs.append((cad, None))
    if not jobs:
        raise SystemExit("no models found")
    end = len(jobs) if args.end < 0 else args.end
    for cad, obj_id in jobs[args.start : end]:
        t0 = time.perf_counter()
        poses = render_object_bank(cad, args.out_dir, args.level, table, obj_id)
        print(f"{os.path.basename(cad)}: {len(poses)} views "
              f"in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
