"""Generate a fully self-contained synthetic BOP + MegaPose world.

Everything the real pipelines need — template banks, a BOP test scene tree
(rgb, depth, scene_camera/scene_gt/scene_gt_info, models with
models_info.json, CNOS-style detections, bop19 targets) and a MegaPose-GSO
training shard tree — rendered with the in-repo native rasterizer from a
procedurally built CAD.  No external data, no network.

This is the data substrate for the end-to-end accuracy loop
(examples/train_to_ar.py): run_train.py overfits on the training tree,
run_test.py evaluates on the BOP tree, score_csv.py computes AR against the
scene_gt written here.  Layouts mirror the reference's disk contracts
(provider/bop_test_dataset.py:27-308, provider/training_dataset.py:31-170,
rendering/scripts/render_bop_templates.py:104-115).

Usage:
    python tools/synthetic_world.py --root /tmp/world --train 128 --test 8
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = np.array(
    [[572.4114, 0, 320.0], [0, 573.57043, 240.0], [0, 0, 1.0]], np.float32
)
DS = "fakeds"


def encode_rle(mask: np.ndarray) -> dict:
    """COCO-style uncompressed RLE (column-major), as CNOS writes it."""
    flat = mask.flatten(order="F").astype(np.uint8)
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat[0] == 1:  # RLE starts with a zero-run
        counts = [0] + counts
    return {"size": [int(mask.shape[0]), int(mask.shape[1])], "counts": counts}


def make_lshape_ply(path: str, size: float = 60.0) -> None:
    """An asymmetric L-shaped solid (two boxes) with position-keyed vertex
    colors — no geometric or visual symmetry, so pose errors are
    unambiguous for AR scoring (a cube's discrete symmetries would need
    symmetry-aware metrics to score fairly)."""
    s = size / 2.0

    def box(cx, cy, cz, hx, hy, hz, base):
        verts = np.array(
            [
                [cx + dx * hx, cy + dy * hy, cz + dz * hz]
                for dx in (-1, 1)
                for dy in (-1, 1)
                for dz in (-1, 1)
            ],
            np.float32,
        )
        quads = [
            (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
            (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
        ]
        faces = []
        for a, b, c, d in quads:
            faces += [(base + a, base + b, base + c),
                      (base + a, base + c, base + d)]
        return verts, faces

    v1, f1 = box(0, 0, 0, s, 0.45 * s, 0.45 * s, 0)  # long arm along x
    v2, f2 = box(-0.55 * s, 0.7 * s, 0.1 * s, 0.45 * s, 0.6 * s, 0.35 * s, 8)
    verts = np.concatenate([v1, v2])
    faces = f1 + f2
    span = verts.max(0) - verts.min(0)
    colors = (
        (verts - verts.min(0)) / np.maximum(span, 1e-6) * 255.0
    ).astype(np.uint8)
    with open(path, "wb") as f:
        hdr = [
            "ply", "format ascii 1.0",
            f"element vertex {len(verts)}",
            "property float x", "property float y", "property float z",
            "property uchar red", "property uchar green", "property uchar blue",
            f"element face {len(faces)}",
            "property list uchar int vertex_indices",
            "end_header",
        ]
        f.write(("\n".join(hdr) + "\n").encode())
        for v, c in zip(verts, colors):
            f.write(f"{v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n".encode())
        for a, b, c in faces:
            f.write(f"3 {a} {b} {c}\n".encode())


def random_poses(n: int, rng: np.random.Generator, z0: float) -> np.ndarray:
    """Uniform random rotations (quaternion method) + jittered translation."""
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    R = np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(n, 3, 3)
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T[:, :3, :3] = R.astype(np.float32)
    T[:, 0, 3] = rng.uniform(-30, 30, n)
    T[:, 1, 3] = rng.uniform(-25, 25, n)
    T[:, 2, 3] = z0 * rng.uniform(0.85, 1.25, n)
    return T


def build(root: str, n_train: int, n_test: int, size: float, level: int,
          seed: int, mesh: str = "lshape") -> None:
    from picopose_tpu.native.renderer import (
        load_ply, render_object_bank, render_views,
    )

    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    rng = np.random.default_rng(seed)

    cad = os.path.join(root, "obj_000001.ply")
    if mesh == "cube":
        from tests.test_native import make_cube_ply

        make_cube_ply(cad, size=size)
    else:
        make_lshape_ply(cad, size=size)

    bank_dir = os.path.join(root, "templates", DS)
    render_object_bank(cad, bank_dir, level=level, obj_id=1)

    verts, colors, faces = load_ply(cad)
    radii = np.linalg.norm(verts - verts.mean(0), axis=1)
    diameter = float(2.0 * radii.max())
    z0 = 4.0 * diameter  # ~140 px across at 640x480 with K above

    # ---- BOP test tree (scoreable: models + gt + depth)
    test_poses = random_poses(n_test, rng, z0)
    rgba, depth = render_views(verts, colors, faces, test_poses, K)
    scene_dir = os.path.join(root, "bop", DS, "test", "000001")
    os.makedirs(os.path.join(scene_dir, "rgb"))
    os.makedirs(os.path.join(scene_dir, "depth"))
    import imageio.v2 as imageio

    cam, gt, gt_info, dets, targets = {}, {}, {}, [], []
    for im_id, (im, dep, pose) in enumerate(zip(rgba, depth, test_poses)):
        imageio.imwrite(
            os.path.join(scene_dir, "rgb", f"{im_id:06d}.png"), im[..., :3]
        )
        imageio.imwrite(
            os.path.join(scene_dir, "depth", f"{im_id:06d}.png"), dep
        )
        cam[str(im_id)] = {"cam_K": K.reshape(-1).tolist(), "depth_scale": 1.0}
        mask = (im[..., 3] > 0).astype(np.uint8)
        ys, xs = np.where(mask)
        bbox = [int(xs.min()), int(ys.min()),
                int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)]
        gt[str(im_id)] = [{
            "obj_id": 1,
            "cam_R_m2c": pose[:3, :3].reshape(-1).tolist(),
            "cam_t_m2c": pose[:3, 3].reshape(-1).tolist(),
        }]
        gt_info[str(im_id)] = [{
            "bbox_visib": bbox, "px_count_visib": int(mask.sum()),
            "px_count_all": int(mask.sum()), "px_count_valid": int(mask.sum()),
            "visib_fract": 1.0,
        }]
        dets.append({
            "scene_id": 1, "image_id": im_id, "category_id": 1,
            "bbox": bbox, "score": 0.9, "time": 0.05,
            "segmentation": encode_rle(mask),
        })
        targets.append(
            {"scene_id": 1, "im_id": im_id, "obj_id": 1, "inst_count": 1}
        )
    for name, obj in [
        ("scene_camera.json", cam), ("scene_gt.json", gt),
        ("scene_gt_info.json", gt_info),
    ]:
        with open(os.path.join(scene_dir, name), "w") as f:
            json.dump(obj, f)
    with open(os.path.join(root, "bop", DS, "test_targets_bop19.json"), "w") as f:
        json.dump(targets, f)
    os.makedirs(os.path.join(root, "dets"), exist_ok=True)
    with open(os.path.join(root, "dets", f"{DS}.json"), "w") as f:
        json.dump(dets, f)

    mdir = os.path.join(root, "bop", DS, "models")
    os.makedirs(mdir)
    shutil.copy(cad, os.path.join(mdir, "obj_000001.ply"))
    mn, mx = verts.min(0), verts.max(0)
    with open(os.path.join(mdir, "models_info.json"), "w") as f:
        json.dump({"1": {
            "diameter": diameter,
            "min_x": float(mn[0]), "min_y": float(mn[1]), "min_z": float(mn[2]),
            "size_x": float(mx[0] - mn[0]), "size_y": float(mx[1] - mn[1]),
            "size_z": float(mx[2] - mn[2]),
        }}, f)

    # ---- MegaPose-GSO training tree.  REAL-branch gt/depth use the plain
    # BOP convention (mm; the loader divides by 1000 only —
    # provider/training_dataset.py real branch / data/megapose.py
    # _process_real).  Only the TEMPLATE bank carries the GSO x10 so the
    # loader's x0.1/1000 restores meters (training_dataset.py:294-298).
    web = os.path.join(root, "mp", "MegaPose-GSO", "train_pbr_web")
    shard = os.path.join(web, "shard-000000")
    os.makedirs(shard)
    train_poses = random_poses(n_train, rng, z0)
    key_to_shard = {}
    chunk = 16  # render in chunks to bound memory
    for c0 in range(0, n_train, chunk):
        tp = train_poses[c0:c0 + chunk]
        rgba_t, depth_t = render_views(verts, colors, faces, tp, K)
        for j, (im, dep, pose) in enumerate(zip(rgba_t, depth_t, tp)):
            i = c0 + j
            key = f"{i:08d}"
            key_to_shard[key] = 0
            base = os.path.join(shard, key)
            imageio.imwrite(base + ".rgb.jpg", im[..., :3], quality=95)
            imageio.imwrite(base + ".depth.png", dep)  # uint16 mm
            mask = (im[..., 3] > 0).astype(np.uint8)
            with open(base + ".mask_visib.json", "w") as f:
                json.dump({"0": encode_rle(mask)}, f)
            with open(base + ".gt.json", "w") as f:
                json.dump([{
                    "obj_id": 1,
                    "cam_R_m2c": pose[:3, :3].reshape(-1).tolist(),
                    "cam_t_m2c": pose[:3, 3].reshape(-1).tolist(),
                }], f)
            with open(base + ".gt_info.json", "w") as f:
                json.dump([{
                    "px_count_valid": int(mask.sum()), "visib_fract": 1.0
                }], f)
            with open(base + ".camera.json", "w") as f:
                json.dump(
                    {"cam_K": K.reshape(-1).tolist(), "depth_scale": 1.0}, f
                )
    with open(os.path.join(web, "key_to_shard.json"), "w") as f:
        json.dump(key_to_shard, f)

    # GSO-layout template bank: MUST be level 1 (162 views) — the training
    # loader's nearest-view table is the reference's fixed level-1 icosphere
    # (data/megapose.py, training_dataset.py:320-332); a smaller bank makes
    # most view picks miss.  Depth & pose x10 (the GSO loader's x0.1/1000
    # restores meters).
    tdir = os.path.join(root, "mp", "MegaPose-Templates", "GSO")
    render_object_bank(cad, tdir, level=1, obj_id=1)
    poses = np.load(os.path.join(tdir, "object_poses", "000001.npy")).copy()
    poses[:, :3, 3] *= 10.0
    np.save(os.path.join(tdir, "object_poses", "000001.npy"), poses)
    for fn in os.listdir(os.path.join(tdir, "000001")):
        if fn.endswith("_depth.png"):
            p = os.path.join(tdir, "000001", fn)
            d = imageio.imread(p).astype(np.float64) * 10.0
            imageio.imwrite(p, np.clip(d, 0, 65535).astype(np.uint16))

    print(
        f"synthetic world at {root}: {n_train} train / {n_test} test views, "
        f"bank level {level}, diameter {diameter:.1f} mm"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synthetic_world")
    ap.add_argument("--train", type=int, default=128)
    ap.add_argument("--test", type=int, default=8)
    ap.add_argument("--size", type=float, default=60.0)
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mesh", choices=["lshape", "cube"], default="lshape")
    args = ap.parse_args()
    build(args.root, args.train, args.test, args.size, args.level, args.seed,
          args.mesh)


if __name__ == "__main__":
    main()
