"""Template rendering: PLY loading + the C++ rasterizer + bank writing.

High-level equivalent of rendering/scripts/render_bop_templates.py: for each
CAD model, generate the icosphere viewpoint poses at z = diameter, render
RGBA + depth at 640x480 with the fixed template K, and write the bank in the
reference's on-disk layout ({view:06d}.png, {view:06d}_depth.png,
object_poses/{obj:06d}.npy) so banks are interchangeable with
reference-rendered ones (given the same pose table; see geom/templates.py on
view ordering).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from picopose_tpu.native import load_library

TEMPLATES_K = np.array(
    [[572.4114, 0.0, 320.0], [0.0, 573.57043, 240.0], [0.0, 0.0, 1.0]],
    np.float32,
)  # call_panda3d.py:48-54


def load_ply(path: str) -> tuple[np.ndarray, np.ndarray | None, np.ndarray]:
    """Minimal PLY loader (ascii + binary_little_endian), replacing trimesh.

    Returns (verts (V, 3) float32, colors (V, 3) float32 in [0,1] or None,
    faces (F, 3) int32).
    """
    with open(path, "rb") as f:
        # ---- header
        line = f.readline().strip()
        assert line == b"ply", f"not a ply file: {path}"
        fmt = None
        elements: list[tuple[str, int, list[tuple[str, str]]]] = []
        props: list[tuple[str, str]] = []
        while True:
            line = f.readline().strip().decode("ascii", "ignore")
            if line.startswith("comment") or line.startswith("obj_info"):
                continue
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                props = []
                elements.append((name, int(cnt), props))
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    props.append((parts[-1], f"list:{parts[2]}:{parts[3]}"))
                else:
                    props.append((parts[-1], parts[1]))
            elif line == "end_header":
                break

        np_types = {
            "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
            "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
        }

        verts = colors = faces = None
        for name, cnt, props_ in elements:
            if name == "vertex":
                if fmt == "ascii":
                    rows = [f.readline().split() for _ in range(cnt)]
                    arr = np.array(rows, dtype=np.float64)
                    names = [p[0] for p in props_]
                else:
                    dt = np.dtype([(p[0], "<" + np_types[p[1]]) for p in props_])
                    arr_s = np.frombuffer(f.read(cnt * dt.itemsize), dtype=dt)
                    names = list(dt.names)
                    arr = np.stack(
                        [arr_s[n].astype(np.float64) for n in names], axis=1
                    )
                ix = [names.index(c) for c in ("x", "y", "z")]
                verts = arr[:, ix].astype(np.float32)
                if all(c in names for c in ("red", "green", "blue")):
                    ic = [names.index(c) for c in ("red", "green", "blue")]
                    colors = (arr[:, ic] / 255.0).astype(np.float32)
            elif name == "face":
                tris = []
                if fmt == "ascii":
                    for _ in range(cnt):
                        vals = list(map(int, f.readline().split()))
                        k = vals[0]
                        for j in range(1, k - 1):  # fan-triangulate
                            tris.append((vals[1], vals[1 + j], vals[2 + j]))
                else:
                    list_spec = props_[0][1]  # "list:<count_t>:<idx_t>"
                    _, ct, it = list_spec.split(":")
                    ct_dt = np.dtype("<" + np_types[ct])
                    it_dt = np.dtype("<" + np_types[it])
                    for _ in range(cnt):
                        k = int(np.frombuffer(f.read(ct_dt.itemsize), ct_dt)[0])
                        idx = np.frombuffer(f.read(k * it_dt.itemsize), it_dt)
                        for j in range(1, k - 1):
                            tris.append((idx[0], idx[j], idx[j + 1]))
                faces = np.asarray(tris, dtype=np.int32)
    assert verts is not None and faces is not None, f"bad ply: {path}"
    return verts, colors, faces


def render_views(
    verts: np.ndarray,
    colors: np.ndarray | None,
    faces: np.ndarray,
    poses: np.ndarray,
    K: np.ndarray = TEMPLATES_K,
    hw: tuple[int, int] = (480, 640),
    n_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Rasterize (N, 4, 4) camera-from-model poses -> (rgba (N, H, W, 4)
    uint8, depth (N, H, W) uint16 mm)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable; run `make -C native`")
    H, W = hw
    N = len(poses)
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    poses = np.ascontiguousarray(poses, np.float32)
    Kc = np.ascontiguousarray(K, np.float32)
    rgba = np.zeros((N, H, W, 4), np.uint8)
    depth = np.zeros((N, H, W), np.uint16)
    cptr = None
    if colors is not None:
        colors = np.ascontiguousarray(colors, np.float32)
        cptr = colors.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    if n_threads <= 0:
        n_threads = min(16, os.cpu_count() or 1)
    lib.render_templates(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cptr,
        ctypes.c_int(len(verts)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(len(faces)),
        Kc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        poses.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(N),
        ctypes.c_int(W),
        ctypes.c_int(H),
        ctypes.c_int(n_threads),
        rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    return rgba, depth


def render_object_bank(
    cad_path: str,
    out_dir: str,
    level: int = 1,
    pose_table: np.ndarray | None = None,
    obj_id: int | None = None,
) -> np.ndarray:
    """Render one CAD's template bank in the reference layout.

    Viewpoints: icosphere level poses with z set to the model diameter
    (render_bop_templates.py:104-115).  Returns the (N, 4, 4) pose table
    written to object_poses/<obj>.npy (mm units, like the reference banks).
    """
    import imageio.v2 as imageio

    from picopose_tpu.geom.templates import template_object_poses

    verts, colors, faces = load_ply(cad_path)
    radii = np.linalg.norm(verts - verts.mean(0), axis=1)
    diameter = 2.0 * radii.max()

    poses = (
        pose_table.copy()
        if pose_table is not None
        else template_object_poses(level).copy()
    )
    poses[:, :3, 3] *= diameter / 1000.0  # table radius 1000 -> diameter

    rgba, depth = render_views(verts, colors, faces, poses)

    if obj_id is None:
        obj_id = int(os.path.splitext(os.path.basename(cad_path))[0].split("_")[-1])
    vdir = os.path.join(out_dir, f"{obj_id:06d}")
    os.makedirs(vdir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "object_poses"), exist_ok=True)
    for v in range(len(poses)):
        imageio.imwrite(os.path.join(vdir, f"{v:06d}.png"), rgba[v])
        imageio.imwrite(os.path.join(vdir, f"{v:06d}_depth.png"), depth[v])
    np.save(os.path.join(out_dir, "object_poses", f"{obj_id:06d}.npy"), poses)
    return poses
