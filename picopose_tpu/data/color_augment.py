"""Color augmentation for training crops (numpy/cv2, no imgaug).

Equivalent of the reference's gdrnpp imgaug pipeline
(provider/training_dataset.py:88-105): a random-order sequence of
probabilistic photometric ops on uint8 RGB.  Each op mirrors its imgaug
counterpart's parameter ranges; per-channel variants are sampled per the
same probabilities.  Exact RNG parity with imgaug is neither possible nor
needed — the training distribution is what matters.
"""

from __future__ import annotations

import numpy as np
import cv2


def _blend(a: np.ndarray, b: np.ndarray, factor: float) -> np.ndarray:
    out = a.astype(np.float32) * (1 - factor) + b.astype(np.float32) * factor
    return np.clip(out, 0, 255)


def _grayscale(img):
    g = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY)
    return np.stack([g] * 3, axis=-1).astype(np.float32)


def augment_color(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """uint8 (H, W, 3) -> uint8, the full probabilistic pipeline."""
    x = img.astype(np.float32)

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
    order = rng.permutation(len(ops))
    for i in order:
        p, fn = ops[i]
        if rng.random() < p:
            x = fn(rng, x)
    return np.clip(x, 0, 255).astype(np.uint8)


def _coarse_dropout(rng, x):  # CoarseDropout(p=0.2, size_percent=0.05)
    H, W = x.shape[:2]
    gh, gw = max(1, int(H * 0.05)), max(1, int(W * 0.05))
    drop = rng.random((gh, gw)) < 0.2
    drop = cv2.resize(drop.astype(np.uint8), (W, H), interpolation=cv2.INTER_NEAREST)
    return x * (1 - drop[..., None])


def _gaussian_blur(rng, x):  # GaussianBlur((0, 3))
    sigma = rng.uniform(0.0, 3.0)
    if sigma < 1e-3:
        return x
    return cv2.GaussianBlur(x, (0, 0), sigma)


def _sharpness(rng, x):  # EnhanceSharpness(0..50)
    f = rng.uniform(0.0, 50.0)
    blur = cv2.GaussianBlur(x, (0, 0), 1.0)
    return _blend(blur, x, f)  # factor 1 = identity, >1 sharpens


def _contrast_enhance(rng, x):  # EnhanceContrast(0.2..50)
    f = rng.uniform(0.2, 50.0)
    mean = x.mean()
    return _blend(np.full_like(x, mean), x, min(f, 4.0))


def _brightness(rng, x):  # EnhanceBrightness(0.1..6)
    f = rng.uniform(0.1, 6.0)
    return np.clip(x * min(f, 4.0), 0, 255)


def _color_enhance(rng, x):  # EnhanceColor(0..20)
    f = rng.uniform(0.0, 20.0)
    return _blend(_grayscale(x), x, min(f, 4.0))


def _add(rng, x):  # Add(-25..25, per_channel 0.3)
    if rng.random() < 0.3:
        return x + rng.uniform(-25, 25, size=(1, 1, 3))
    return x + rng.uniform(-25, 25)


def _invert(rng, x):  # Invert(0.2, per_channel)
    ch = rng.random(3) < 0.2
    out = x.copy()
    out[..., ch] = 255 - out[..., ch]
    return out


def _multiply_per_channel(rng, x):  # Multiply(0.6..1.4, per_channel 0.5)
    if rng.random() < 0.5:
        return x * rng.uniform(0.6, 1.4, size=(1, 1, 3))
    return x * rng.uniform(0.6, 1.4)


def _multiply(rng, x):  # Multiply(0.6..1.4)
    return x * rng.uniform(0.6, 1.4)


def _gauss_noise(rng, x):  # AdditiveGaussianNoise(scale=10, per_channel)
    return x + rng.normal(0, 10, x.shape)


def _linear_contrast(rng, x):  # LinearContrast(0.5..2.2, per_channel 0.3)
    if rng.random() < 0.3:
        a = rng.uniform(0.5, 2.2, size=(1, 1, 3))
    else:
        a = rng.uniform(0.5, 2.2)
    return (x - 127.5) * a + 127.5


def _grayscale_blend(rng, x):  # Grayscale(alpha 0..1): alpha=1 -> fully gray
    a = rng.uniform(0.0, 1.0)
    return _blend(x, _grayscale(x), a)
