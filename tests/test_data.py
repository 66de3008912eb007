"""Data-layer tests: RLE, crops, config, color augmentation."""

import json
import os

import numpy as np
import pytest

from picopose_tpu.data.color_augment import augment_color
from picopose_tpu.data.crops import (
    crop_matrix,
    crop_mask,
    grid_pts2d,
    mask_square_bbox,
    square_bbox,
)
from picopose_tpu.data.rle import decode_compressed_counts, rle_to_mask
from picopose_tpu.utils.config import Config, load_config


def encode_compressed_counts(counts):
    """Inverse of COCO's modified LEB128 (test-only oracle)."""
    s = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x = x - counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            s.append(c + 48)
    return bytes(s)


class TestRLE:
    def test_uncompressed_roundtrip(self, rng):
        m = (rng.random((13, 17)) > 0.5).astype(np.uint8)
        flat = m.flatten(order="F")
        # build run lengths starting with a background run
        counts, cur, run = [], 0, 0
        for v in flat:
            if v == cur:
                run += 1
            else:
                counts.append(run)
                cur, run = v, 1
        counts.append(run)
        out = rle_to_mask({"size": [13, 17], "counts": counts})
        np.testing.assert_array_equal(out, m)

    def test_compressed_roundtrip(self, rng):
        counts = [5, 3, 10, 2, 7, 1, 100]
        enc = encode_compressed_counts(counts)
        assert decode_compressed_counts(enc) == counts

    def test_compressed_mask(self, rng):
        m = (rng.random((20, 30)) > 0.6).astype(np.uint8)
        flat = m.flatten(order="F")
        counts, cur, run = [], 0, 0
        for v in flat:
            if v == cur:
                run += 1
            else:
                counts.append(run)
                cur, run = v, 1
        counts.append(run)
        enc = encode_compressed_counts(counts).decode()
        out = rle_to_mask({"size": [20, 30], "counts": enc})
        np.testing.assert_array_equal(out, m)


class TestCrops:
    def test_mask_square_bbox_is_square_and_contains(self):
        m = np.zeros((100, 120))
        m[30:50, 40:90] = 1
        y1, y2, x1, x2 = mask_square_bbox(m)
        assert (y2 - y1) == (x2 - x1)
        assert y1 <= 30 and y2 >= 50 - 1

    def test_square_bbox_clamps_at_borders(self):
        b = square_bbox((0, 10, 0, 80), (100, 120))
        y1, y2, x1, x2 = b
        assert y1 >= 0 and x1 >= 0 and y2 <= 100 and x2 <= 120
        assert (y2 - y1) == (x2 - x1)

    def test_crop_matrix_maps_bbox_corner(self):
        bbox = (10, 74, 20, 84)  # 64 px square
        M = crop_matrix(bbox, 224)
        p = M @ np.array([20.0, 10.0, 1.0])
        np.testing.assert_allclose(p[:2] / p[2], [0, 0], atol=1e-5)
        p = M @ np.array([84.0, 74.0, 1.0])
        np.testing.assert_allclose(p[:2] / p[2], [224, 224], atol=1e-4)

    def test_grid_pts2d_inverts_crop(self):
        bbox = (10, 74, 20, 84)
        M = crop_matrix(bbox, 224)
        pts = grid_pts2d(M, 224, 64)
        # first patch center (1.75, 1.75) in crop -> original
        expect = np.linalg.inv(M) @ np.array([1.75, 1.75, 1.0])
        np.testing.assert_allclose(pts[0, 0], expect[:2] / expect[2], atol=1e-4)


class TestColorAugment:
    def test_preserves_shape_dtype_range(self, rng):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        for seed in range(5):
            out = augment_color(np.random.default_rng(seed), img)
            assert out.shape == img.shape and out.dtype == np.uint8

    def test_stochastic(self, rng):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        a = augment_color(np.random.default_rng(1), img)
        b = augment_color(np.random.default_rng(2), img)
        assert not np.array_equal(a, b)

    def test_deterministic_given_rng(self, rng):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        a = augment_color(np.random.default_rng(7), img)
        b = augment_color(np.random.default_rng(7), img)
        np.testing.assert_array_equal(a, b)

    def test_pil_enhance_exact(self, rng):
        # the pillike ops go through PIL.ImageEnhance — exactly what
        # imgaug's pillike backend does (reference pipeline,
        # provider/training_dataset.py:90-94)
        from PIL import Image, ImageEnhance
        from picopose_tpu.data.color_augment import _pil_enhance

        img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        for kind, factor in [
            ("Sharpness", 13.7),
            ("Contrast", 0.4),
            ("Brightness", 3.2),
            ("Color", 8.5),
        ]:
            ours = _pil_enhance(kind, img, factor)
            ref = np.asarray(
                getattr(ImageEnhance, kind)(Image.fromarray(img)).enhance(factor)
            )
            np.testing.assert_array_equal(ours, ref)

    def test_add_saturates_uint8(self):
        from picopose_tpu.data.color_augment import _add

        img = np.full((8, 8, 3), 250, np.uint8)
        # find an rng draw that picks a positive shared offset
        for seed in range(50):
            r = np.random.default_rng(seed)
            out = _add(r, img)
            assert out.dtype == np.uint8
            assert out.max() <= 255 and out.min() >= 0

    def test_linear_contrast_formula(self):
        from picopose_tpu.data.color_augment import _linear_contrast

        img = np.full((4, 4, 3), 227, np.uint8)

        class FixedRng:
            def random(self):
                return 1.0  # not per-channel

            def uniform(self, lo, hi, size=None):
                return 2.0

        out = _linear_contrast(FixedRng(), img)
        # 127 + 2*(227-127) = 327 -> clips to 255
        assert (out == 255).all()
        out2 = _linear_contrast(FixedRng(), np.full((4, 4, 3), 100, np.uint8))
        # 127 + 2*(100-127) = 73
        assert (out2 == 73).all()

    def test_invert_per_channel(self):
        from picopose_tpu.data.color_augment import _invert

        img = np.zeros((4, 4, 3), np.uint8)
        img[..., 0] = 10
        seen_partial = False
        for seed in range(200):
            out = _invert(np.random.default_rng(seed), img)
            flipped = [not np.array_equal(out[..., c], img[..., c]) for c in range(3)]
            if any(flipped) and not all(flipped):
                seen_partial = True
                break
        assert seen_partial, "per-channel invert never flipped a strict subset"

    def test_coarse_dropout_zeroes_all_channels(self):
        from picopose_tpu.data.color_augment import _coarse_dropout

        img = np.full((64, 64, 3), 200, np.uint8)
        for seed in range(20):
            out = _coarse_dropout(np.random.default_rng(seed), img)
            zero = out == 0
            # dropped pixels are dropped in every channel together
            np.testing.assert_array_equal(zero[..., 0], zero[..., 1])
            np.testing.assert_array_equal(zero[..., 0], zero[..., 2])
            if zero.any():
                return
        raise AssertionError("dropout never dropped anything in 20 draws")

    def test_blur_ksize_heuristic(self):
        from picopose_tpu.data.color_augment import _gaussian_blur_ksize

        for sigma, expect in [(0.5, 5), (2.0, 7), (3.0, 9), (6.0, 15)]:
            k = _gaussian_blur_ksize(sigma)
            assert k == expect and k % 2 == 1


class TestConfig:
    def test_defaults(self):
        cfg = Config()
        assert cfg.optimizer.lr == 1e-5
        assert cfg.model.vit_type == "dinov2_vitl14"

    def test_load_yaml_and_overrides(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("optimizer:\n  lr: 0.001\nmodel:\n  hypothesis: 3\n")
        cfg = load_config(str(p), ["trainer.rd_seed=7", "model.vit_type=dinov2_vits14"])
        assert cfg.optimizer.lr == 0.001
        assert cfg.model.hypothesis == 3
        assert cfg.trainer.rd_seed == 7
        assert cfg.model.vit_type == "dinov2_vits14"

    def test_repo_base_yaml_loads(self):
        cfg = load_config(os.path.join(os.path.dirname(__file__), "..", "configs", "base.yaml"))
        assert cfg.lr_scheduler.max_iters == 400000


class TestLogging:
    def test_loss_meter_window_and_global(self):
        from picopose_tpu.utils.logging import LossMeter

        m = LossMeter(window=3)
        for v in (1.0, 2.0, 3.0, 4.0):
            m.update({"loss": v})
        assert m.window_avg("loss") == 3.0  # last 3
        assert m.global_avg("loss") == 2.5
        assert "loss" in m.line()

    def test_train_logger_writes_file(self, tmp_path):
        from picopose_tpu.utils.logging import TrainLogger

        lg = TrainLogger(str(tmp_path), every=1, tensorboard=False)
        lg.step(1, {"loss": 0.5}, lr=1e-4)
        lg.epoch(0, 1)
        text = (tmp_path / "training_logger.log").read_text()
        assert "iter 1" in text and "epoch 0" in text
