"""Color augmentation for training crops — op-exact rebuild of the
reference's gdrnpp imgaug pipeline (provider/training_dataset.py:88-105).

The reference evals an imgaug `Sequential(random_order=True)` of 13
`Sometimes(p, op)` photometric ops on the uint8 BGR-flipped crop.  This
module reimplements each op with matching semantics, without imgaug:

* the four `pillike.Enhance*` ops are EXACT by construction — imgaug's
  pillike backend converts the array to a PIL Image and calls
  `PIL.ImageEnhance.*`; we do the same (PIL is available here).
* every op restores uint8 before the next op runs (imgaug's
  `restore_dtypes_`: round, clip to [0, 255], cast) — intermediate
  saturation is part of the reference's training distribution.
* remaining ops follow imgaug's documented formulas (LinearContrast
  `127 + alpha*(v-127)`, Grayscale cv2-weight blend, CoarseDropout
  low-res bernoulli mask, GaussianBlur ksize heuristic from
  imgaug/augmenters/blur.py).

Exact RNG-stream parity with imgaug is neither possible nor needed (the
reference never fixes imgaug's seed per sample); op-for-op distributional
parity is.
"""

from __future__ import annotations

import numpy as np
import cv2
from PIL import Image, ImageEnhance


def _restore_uint8(x: np.ndarray) -> np.ndarray:
    """imgaug's per-op uint8 restore: round, clip, cast."""
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


def _pil_enhance(kind: str, img: np.ndarray, factor: float) -> np.ndarray:
    """Exact pillike.Enhance{kind}: PIL ImageEnhance on the uint8 array.

    PIL handles the degenerate images (SMOOTH-filtered for Sharpness,
    mean-L gray for Contrast, L-converted for Color, black for
    Brightness) and the blend rounding; matching it numerically any other
    way is not worth the risk.
    """
    im = Image.fromarray(img, mode="RGB")
    out = getattr(ImageEnhance, kind)(im).enhance(float(factor))
    return np.asarray(out, dtype=np.uint8)


def augment_color(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """uint8 (H, W, 3) -> uint8; the full probabilistic pipeline.

    Mirrors Sequential([Sometimes(p_i, op_i) ...], random_order=True):
    ops run in a fresh random order per image, each gated by its own
    probability, each producing a uint8 image for the next.
    """
    x = np.ascontiguousarray(img).astype(np.uint8)

    ops = [
        (0.5, _coarse_dropout),
        (0.4, _gaussian_blur),
        (0.3, _sharpness),
        (0.3, _contrast_enhance),
        (0.5, _brightness),
        (0.3, _color_enhance),
        (0.5, _add),
        (0.3, _invert),
        (0.5, _multiply_per_channel),
        (0.5, _multiply),
        (0.1, _gauss_noise),
        (0.5, _linear_contrast),
        (0.5, _grayscale_blend),
    ]
    for i in rng.permutation(len(ops)):
        p, fn = ops[i]
        if rng.random() < p:
            x = fn(rng, x)
    return x


def _coarse_dropout(rng, x):
    # CoarseDropout(p=0.2, size_percent=0.05): bernoulli(0.2) mask sampled
    # at 5% resolution, nearest-upscaled, zeroing all channels.
    H, W = x.shape[:2]
    gh, gw = max(1, int(H * 0.05)), max(1, int(W * 0.05))
    drop = (rng.random((gh, gw)) < 0.2).astype(np.uint8)
    drop = cv2.resize(drop, (W, H), interpolation=cv2.INTER_NEAREST)
    return x * (1 - drop[..., None])


def _gaussian_blur_ksize(sigma: float) -> int:
    # imgaug/augmenters/blur.py::_compute_gaussian_blur_ksize —
    # kernel covers ~99/97/95% of the gaussian mass by sigma range.
    if sigma < 3.0:
        ksize = 3.3 * sigma
    elif sigma < 5.0:
        ksize = 2.9 * sigma
    else:
        ksize = 2.6 * sigma
    k = int(max(ksize, 5))
    return k + 1 if k % 2 == 0 else k


def _gaussian_blur(rng, x):  # GaussianBlur((0., 3.))
    sigma = rng.uniform(0.0, 3.0)
    if sigma <= 1e-3:  # imgaug's zero-sigma epsilon gate
        return x
    k = _gaussian_blur_ksize(sigma)
    return cv2.GaussianBlur(x, (k, k), sigmaX=sigma, sigmaY=sigma)


def _sharpness(rng, x):  # pillike.EnhanceSharpness(factor=(0., 50.))
    return _pil_enhance("Sharpness", x, rng.uniform(0.0, 50.0))


def _contrast_enhance(rng, x):  # pillike.EnhanceContrast(factor=(0.2, 50.))
    return _pil_enhance("Contrast", x, rng.uniform(0.2, 50.0))


def _brightness(rng, x):  # pillike.EnhanceBrightness(factor=(0.1, 6.))
    return _pil_enhance("Brightness", x, rng.uniform(0.1, 6.0))


def _color_enhance(rng, x):  # pillike.EnhanceColor(factor=(0., 20.))
    return _pil_enhance("Color", x, rng.uniform(0.0, 20.0))


def _add(rng, x):  # Add((-25, 25), per_channel=0.3): discrete ints, saturating
    if rng.random() < 0.3:
        v = rng.integers(-25, 26, size=(1, 1, 3))
    else:
        v = np.full((1, 1, 1), rng.integers(-25, 26))
    return _restore_uint8(x.astype(np.int16) + v)


def _invert(rng, x):  # Invert(0.2, per_channel=True)
    ch = rng.random(3) < 0.2
    out = x.copy()
    out[..., ch] = 255 - out[..., ch]
    return out


def _multiply_per_channel(rng, x):  # Multiply((0.6, 1.4), per_channel=0.5)
    if rng.random() < 0.5:
        f = rng.uniform(0.6, 1.4, size=(1, 1, 3))
    else:
        f = rng.uniform(0.6, 1.4)
    return _restore_uint8(x.astype(np.float32) * f)


def _multiply(rng, x):  # Multiply((0.6, 1.4))
    return _restore_uint8(x.astype(np.float32) * rng.uniform(0.6, 1.4))


def _gauss_noise(rng, x):  # AdditiveGaussianNoise(scale=10, per_channel=True)
    return _restore_uint8(x.astype(np.float32) + rng.normal(0.0, 10.0, x.shape))


def _linear_contrast(rng, x):  # LinearContrast((0.5, 2.2), per_channel=0.3)
    if rng.random() < 0.3:
        a = rng.uniform(0.5, 2.2, size=(1, 1, 3))
    else:
        a = rng.uniform(0.5, 2.2)
    # imgaug adjust_contrast_linear for uint8: 127 + alpha*(v - 127)
    return _restore_uint8(127.0 + a * (x.astype(np.float32) - 127.0))


def _grayscale_blend(rng, x):  # Grayscale(alpha=(0.0, 1.0))
    a = rng.uniform(0.0, 1.0)
    g = cv2.cvtColor(x, cv2.COLOR_RGB2GRAY)
    g3 = np.repeat(g[..., None], 3, axis=-1).astype(np.float32)
    return _restore_uint8((1.0 - a) * x.astype(np.float32) + a * g3)
