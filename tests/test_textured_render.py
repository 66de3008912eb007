"""UV-texture rendering tests: analytic rasterizer check + mesh loaders.

Covers the reference's textured-CAD rendering capability (Panda3D renders
UV-textured BOP/GSO/ShapeNet models — rendering/src/custom_megapose/
call_panda3d.py:29-60, rendering/scripts/render_gso_templates.py:100-160)
for the in-repo C++ rasterizer: the textured output is pinned against an
analytically computed expected image, and the PLY/OBJ/GLB texture loaders
are round-tripped through tiny hand-written files.
"""

import json
import os
import struct

import numpy as np
import pytest

from picopose_tpu.native import available

pytestmark = pytest.mark.skipif(
    not available(), reason="native library not built (make -C native)"
)

K = np.array([[572.4114, 0, 320.0], [0, 573.57043, 240.0], [0, 0, 1.0]], np.float32)


def quad_mesh(s=30.0):
    """A z=0 square (side 2s, mm) with per-corner UVs covering the texture.

    UV assignment: u grows with +x, v (image convention, 0 = top) grows
    with +y — matching what the loaders produce for a bottom-left-origin
    UV map after the v flip.
    """
    verts = np.array(
        [[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    corner_uv = np.array(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], np.float32
    )
    uv = corner_uv[faces]  # (2, 3, 2)
    return verts, faces, uv


def bilinear_wrap(tex, u, v):
    """Numpy mirror of Texture::sample in native/rasterizer.cpp."""
    h, w = tex.shape[:2]
    x = u * w - 0.5
    y = v * h - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0
    xa, xb = x0 % w, (x0 + 1) % w
    ya, yb = y0 % h, (y0 + 1) % h
    t = tex.astype(np.float64)
    top = t[ya, xa] + fx * (t[ya, xb] - t[ya, xa])
    bot = t[yb, xa] + fx * (t[yb, xb] - t[yb, xa])
    return (top + fy * (bot - top)) / 255.0


def face_shade(cam_verts):
    """Numpy mirror of the rasterizer's ambient+lambert face shading."""
    a, b, c = cam_verts
    n = np.cross(b - a, c - a)
    n = n / np.linalg.norm(n)
    centroid = (a + b + c) / 3.0
    view = centroid / np.linalg.norm(centroid)
    return 0.35 + 0.65 * abs(float(np.dot(n, view)))


class TestAnalyticTexturedQuad:
    def test_pixels_match_analytic_projection(self, rng):
        """Fronto-parallel textured quad: every interior pixel's color must
        equal shade * bilinear(texture, uv(pixel)) where uv(pixel) comes from
        inverting the pinhole projection analytically."""
        from picopose_tpu.native.renderer import render_views

        verts, faces, uv = quad_mesh(s=30.0)
        tex = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Z = 400.0
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = Z

        rgba, depth = render_views(
            verts, None, faces, pose[None], K, (480, 640), uv=uv, texture=tex
        )
        assert (rgba[0, :, :, 3] > 0).sum() > 1000

        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        s = 30.0
        # probe a grid of interior pixels
        for px in range(300, 341, 8):
            for py in range(225, 256, 6):
                # invert the projection at the pixel center
                X = (px + 0.5 - cx) * Z / fx
                Y = (py + 0.5 - cy) * Z / fy
                if abs(X) > 0.8 * s or abs(Y) > 0.8 * s:
                    continue
                u = (X + s) / (2 * s)
                v = (Y + s) / (2 * s)
                # triangle membership: the quad's diagonal is the line Y = X
                # (corner 0 -> corner 2); face 0 covers Y <= X
                tri = faces[0] if Y <= X else faces[1]
                cam = verts[tri] + np.array([0, 0, Z], np.float32)
                shade = face_shade(cam)
                expected = np.clip(bilinear_wrap(tex, u, v) * shade * 255, 0, 255)
                got = rgba[0, py, px, :3].astype(np.float64)
                np.testing.assert_allclose(got, expected, atol=2.0)
        # depth of the quad plane
        assert abs(int(depth[0, 240, 320]) - 400) <= 1

    def test_untextured_path_unchanged(self):
        """The ABI-stable vertex-color path must render identically through
        the new entry point (regression guard for render_templates)."""
        from picopose_tpu.native.renderer import render_views
        from tests.test_native import make_cube_ply

        import tempfile

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "cube.ply")
            make_cube_ply(p, size=50.0)
            from picopose_tpu.native.renderer import load_ply

            v, c, f = load_ply(p)
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 400.0
        rgba, depth = render_views(v, c, f, pose[None], K, (480, 640))
        assert abs(int(depth[0, 240, 320]) - 375) <= 1
        assert rgba[0, 240, 320, 3] == 255


def write_textured_ply(path, tex_name, s=30.0):
    """Textured quad PLY with texture_u/texture_v (BOP textured-CAD style)."""
    # bottom-left-origin UVs (as stored in PLY); loader flips v
    data = [
        (-s, -s, 0, 0.0, 1.0),  # stored v=1 -> image v=0? no: loader does 1-v
        (s, -s, 0, 1.0, 1.0),
        (s, s, 0, 1.0, 0.0),
        (-s, s, 0, 0.0, 0.0),
    ]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"comment TextureFile {tex_name}\n")
        f.write(f"element vertex {len(data)}\n")
        for prop in ("x", "y", "z", "texture_u", "texture_v"):
            f.write(f"property float {prop}\n")
        f.write("element face 2\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for row in data:
            f.write(" ".join(str(x) for x in row) + "\n")
        f.write("3 0 1 2\n3 0 2 3\n")


class TestPlyTexture:
    def test_load_and_render(self, tmp_path):
        import imageio.v2 as imageio

        from picopose_tpu.native.renderer import load_ply_mesh, render_mesh_views

        tex = np.zeros((8, 8, 3), np.uint8)
        tex[:, :4] = [255, 0, 0]   # left half red
        tex[:, 4:] = [0, 0, 255]   # right half blue
        imageio.imwrite(tmp_path / "tex.png", tex)
        write_textured_ply(str(tmp_path / "obj.ply"), "tex.png")

        mesh = load_ply_mesh(str(tmp_path / "obj.ply"))
        assert mesh.texture is not None and mesh.texture.shape == (8, 8, 3)
        assert mesh.uv is not None and mesh.uv.shape == (2, 3, 2)

        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 400.0
        rgba, _ = render_mesh_views(mesh, pose[None], K, (480, 640))
        # u grows with +x (pixel x): left of center red-ish, right blue-ish
        left = rgba[0, 240, 300, :3].astype(int)
        right = rgba[0, 240, 340, :3].astype(int)
        assert left[0] > 150 and left[2] < 60, left
        assert right[2] > 150 and right[0] < 60, right

    def test_load_ply_tuple_api_still_works(self, tmp_path):
        from picopose_tpu.native.renderer import load_ply
        from tests.test_native import make_cube_ply

        p = str(tmp_path / "cube.ply")
        make_cube_ply(p, binary=True)
        v, c, f = load_ply(p)
        assert v.shape == (8, 3) and f.shape == (12, 3) and c is not None


def write_quad_obj(dirpath, s=30.0):
    """Textured quad OBJ + MTL + PNG (GSO/ShapeNet CAD style)."""
    import imageio.v2 as imageio

    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:4] = [0, 255, 0]    # top of IMAGE (v near 1 in OBJ coords) green
    tex[4:] = [255, 0, 255]  # bottom magenta
    imageio.imwrite(os.path.join(dirpath, "texture.png"), tex)
    with open(os.path.join(dirpath, "model.mtl"), "w") as f:
        f.write("newmtl mat0\nKd 1 1 1\nmap_Kd texture.png\n")
    with open(os.path.join(dirpath, "model.obj"), "w") as f:
        f.write("mtllib model.mtl\nusemtl mat0\n")
        for x, y in ((-s, -s), (s, -s), (s, s), (-s, s)):
            f.write(f"v {x} {y} 0\n")
        # OBJ vt: v=0 at BOTTOM.  +y model -> v=0 (bottom of texture)
        for u, v in ((0, 1), (1, 1), (1, 0), (0, 0)):
            f.write(f"vt {u} {v}\n")
        f.write("f 1/1 2/2 3/3 4/4\n")  # quad, fan-triangulated by loader
    return os.path.join(dirpath, "model.obj")


class TestObjLoader:
    def test_load_and_render(self, tmp_path):
        from picopose_tpu.native.renderer import load_obj_mesh, render_mesh_views

        obj = write_quad_obj(str(tmp_path))
        mesh = load_obj_mesh(obj)
        assert mesh.verts.shape == (4, 3)
        assert mesh.faces.shape == (2, 3)  # quad fan-triangulated
        assert mesh.uv is not None and mesh.uv.shape == (2, 3, 2)
        assert mesh.texture is not None

        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 400.0
        rgba, _ = render_mesh_views(mesh, pose[None], K, (480, 640))
        # model -y (pixel y < cy) has vt v=1 -> image v=0 -> green rows
        top = rgba[0, 225, 320, :3].astype(int)
        bot = rgba[0, 255, 320, :3].astype(int)
        assert top[1] > 150 and top[0] < 60, top
        assert bot[0] > 150 and bot[2] > 150 and bot[1] < 60, bot

    def test_negative_indices_and_no_texture(self, tmp_path):
        from picopose_tpu.native.renderer import load_obj_mesh

        p = tmp_path / "plain.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        mesh = load_obj_mesh(str(p))
        assert mesh.faces.tolist() == [[0, 1, 2]]
        assert mesh.texture is None and mesh.uv is None


def write_quad_glb(path, s=30.0):
    """Minimal GLB: one textured-quad primitive with an embedded PNG."""
    import io

    import imageio.v2 as imageio

    verts = np.array(
        [[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32
    )
    # glTF UV origin = top-left: +y model maps to v=1 (bottom of image)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)

    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :4] = [255, 255, 0]
    tex[:, 4:] = [0, 255, 255]
    buf = io.BytesIO()
    imageio.imwrite(buf, tex, format="png")
    png = buf.getvalue()

    bin_parts, views = [], []
    off = 0
    for data in (verts.tobytes(), uvs.tobytes(), idx.tobytes(), png):
        pad = (-len(data)) % 4
        bin_parts.append(data + b"\x00" * pad)
        views.append({"buffer": 0, "byteOffset": off, "byteLength": len(data)})
        off += len(data) + pad
    bin_chunk = b"".join(bin_parts)

    gltf = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": views,
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
             "min": verts.min(0).tolist(), "max": verts.max(0).tolist()},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "images": [{"bufferView": 3, "mimeType": "image/png"}],
        "textures": [{"source": 0}],
        "materials": [
            {"pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}}
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
            "indices": 2, "material": 0,
        }]}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A) + js)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk)


class TestGlbLoader:
    def test_load_and_render(self, tmp_path):
        from picopose_tpu.native.renderer import load_glb_mesh, render_mesh_views

        p = str(tmp_path / "model.glb")
        write_quad_glb(p)
        mesh = load_glb_mesh(p)
        assert mesh.verts.shape == (4, 3) and mesh.faces.shape == (2, 3)
        assert mesh.uv is not None and mesh.texture is not None
        assert mesh.texture.shape == (8, 8, 3)

        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 400.0
        rgba, _ = render_mesh_views(mesh, pose[None], K, (480, 640))
        left = rgba[0, 240, 300, :3].astype(int)   # u < 0.5: yellow
        right = rgba[0, 240, 340, :3].astype(int)  # u > 0.5: cyan
        assert left[0] > 150 and left[1] > 150 and left[2] < 60, left
        assert right[1] > 150 and right[2] > 150 and right[0] < 60, right


class TestBankFromObj:
    def test_render_object_bank_obj(self, tmp_path):
        """`--models_json` path: a GSO-style OBJ renders a full bank
        (render_gso_templates.py analogue, now actually possible)."""
        from picopose_tpu.native.renderer import render_object_bank

        obj = write_quad_obj(str(tmp_path))
        out = str(tmp_path / "bank")
        poses = render_object_bank(obj, out, level=0, obj_id=7)
        assert poses.shape == (42, 4, 4)
        assert os.path.exists(os.path.join(out, "000007", "000000.png"))
        assert os.path.exists(os.path.join(out, "object_poses", "000007.npy"))
        import imageio.v2 as imageio

        # at least one view must show textured (green/magenta) pixels
        seen = False
        for v in range(0, 42, 7):
            im = np.asarray(
                imageio.imread(os.path.join(out, "000007", f"{v:06d}.png"))
            )
            hit = im[..., 3] > 0
            if hit.sum() > 50:
                px = im[hit][:, :3].astype(int)
                seen = seen or (px[:, 1] > 100).any()
        assert seen
