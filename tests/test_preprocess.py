"""On-device preprocessing vs the host loader path (ops/preprocess.py).

The device stage must reproduce the host's crop semantics (data/crops.py,
reference utils/data_utils.py:131-196 + bop_test_dataset.py:146-209):
integer bbox math exactly, interpolated pixels to <=1e-3."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from picopose_tpu.data.crops import (  # noqa: E402
    crop_and_normalize_rgb_py,
    crop_matrix,
    crop_mask,
    grid_pts2d,
    mask_square_bbox,
    square_bbox,
)
from picopose_tpu.ops.preprocess import preprocess_frame  # noqa: E402


def _blob_mask(H, W, cy, cx, ry, rx):
    yy, xx = np.mgrid[:H, :W]
    return ((((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0).astype(
        np.uint8
    )


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)


class TestPreprocessFrame:
    # blobs: centered, near top-left border, near bottom-right border, thin
    CASES = [
        (60, 80, 25, 30),
        (8, 10, 12, 14),
        (112, 152, 18, 10),
        (60, 80, 40, 4),
    ]

    def _host_batch(self, frame, masks, out=64, pts=16, mask_rgb=False):
        rgbs, ms, Ms, ps = [], [], [], []
        for mask in masks:
            bbox = mask_square_bbox(mask)
            M = crop_matrix(bbox, out)
            rgbs.append(crop_and_normalize_rgb_py(
                frame, bbox, out, mask, mask_rgb
            ))
            ms.append(crop_mask(mask, bbox, out))
            Ms.append(M)
            ps.append(grid_pts2d(M, out, pts))
        return (np.stack(rgbs), np.stack(ms), np.stack(Ms), np.stack(ps))

    def test_mask_path_matches_host(self, frame):
        masks = np.stack([_blob_mask(120, 160, *c) for c in self.CASES])
        out = preprocess_frame(
            jnp.asarray(frame), jnp.asarray(masks), out=64, pts=16
        )
        h_rgb, h_m, h_M, h_p = self._host_batch(frame, masks)
        np.testing.assert_allclose(
            np.asarray(out["real_rgb"]), h_rgb, atol=1e-3
        )
        np.testing.assert_array_equal(np.asarray(out["real_mask"]), h_m)
        np.testing.assert_allclose(np.asarray(out["real_M"]), h_M, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out["real_pts2d"]), h_p, atol=1e-3
        )

    def test_mask_rgb_flag(self, frame):
        masks = np.stack([_blob_mask(120, 160, *c) for c in self.CASES[:2]])
        out = preprocess_frame(
            jnp.asarray(frame), jnp.asarray(masks), out=64, pts=16,
            mask_rgb=True,
        )
        h_rgb, _, _, _ = self._host_batch(frame, masks, mask_rgb=True)
        np.testing.assert_allclose(
            np.asarray(out["real_rgb"]), h_rgb, atol=1e-3
        )

    def test_bbox_fallback_path(self, frame):
        """use_bbox selects the detector-box path (host: square_bbox on the
        xyxy box + filled-rect mask)."""
        H, W = 120, 160
        boxes_yx = [(20, 70, 30, 90), (50, 110, 80, 150)]
        masks, bboxes = [], []
        for (y1, y2, x1, x2) in boxes_yx:
            m = np.zeros((H, W), np.uint8)
            sq = square_bbox((y1, y2, x1, x2), (H, W))
            m[sq[0]:sq[1], sq[2]:sq[3]] = 1
            masks.append(m)
            bboxes.append((y1, y2, x1, x2))
        masks = np.stack(masks)
        out = preprocess_frame(
            jnp.asarray(frame), jnp.asarray(masks),
            bboxes=jnp.asarray(bboxes, jnp.int32),
            use_bbox=jnp.ones((2,), bool), out=64, pts=16,
        )
        rgbs, Ms = [], []
        for m, bx in zip(masks, boxes_yx):
            sq = square_bbox(bx, (H, W))
            rgbs.append(crop_and_normalize_rgb_py(frame, sq, 64, m, False))
            Ms.append(crop_matrix(sq, 64))
        np.testing.assert_allclose(
            np.asarray(out["real_rgb"]), np.stack(rgbs), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["real_M"]), np.stack(Ms), rtol=1e-6
        )

    def test_jit_reuse_across_frames(self, frame):
        """Same shapes -> no retrace; different content -> different crops."""
        masks = np.stack([_blob_mask(120, 160, *c) for c in self.CASES[:2]])
        o1 = preprocess_frame(jnp.asarray(frame), jnp.asarray(masks))
        o2 = preprocess_frame(
            jnp.asarray(255 - frame), jnp.asarray(masks)
        )
        assert o1["real_rgb"].shape == (2, 224, 224, 3)
        assert o1["real_pts2d"].shape == (2, 64, 64, 2)
        assert not np.allclose(
            np.asarray(o1["real_rgb"]), np.asarray(o2["real_rgb"])
        )
