"""Pure-numpy image kernels mirroring the reference's TF image ops.

These are the vectorized per-record kernels the pandas-UDF pipeline
stages call (SURVEY.md M2-M9). Semantics match the reference
(dataset_preprocessing.py); bit-exactness with TF is explicitly not a
goal — invariants (shape, dtype, value range, determinism under a fixed
seed) are what the tests pin down.

Randomness discipline: every randomized kernel takes a
`np.random.Generator`. Callers derive the generator per ROW as
rng_for_row(global_seed, row_id) so results are reproducible under Spark
task retries and independent of partitioning (SURVEY.md §4: never
`rand()` inside a UDF).
"""

from __future__ import annotations

import numpy as np


def rng_for_row(seed: int, row_id: int) -> np.random.Generator:
    """Stable per-row generator: seed sequence spawned from (seed, row_id)."""
    return np.random.Generator(np.random.Philox(key=np.uint64(seed), counter=[0, 0, 0, np.uint64(row_id)]))


# --------------------------------------------------------------------------
# Resize (reference M4: tf.image.resize_images, bilinear/nearest)
# --------------------------------------------------------------------------
def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(out_h) + 0.5) * (h / out_h), h - 1).astype(np.int64)
    cols = np.minimum((np.arange(out_w) + 0.5) * (w / out_w), w - 1).astype(np.int64)
    return img[rows][:, cols]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample, half-pixel centers (align_corners=False), float32
    out. Reference: tf.image.resize_bilinear (dataset_preprocessing.py:
    269-272)."""
    h, w = img.shape[:2]
    src = img.astype(np.float32)
    ys = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(np.float32)[:, None, None]
    wx = (xs - x0).astype(np.float32)[None, :, None]
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


# --------------------------------------------------------------------------
# Crops (reference M3 distorted_bounding_box_crop, M9 central_crop)
# --------------------------------------------------------------------------
def central_crop(img: np.ndarray, fraction: float) -> np.ndarray:
    """Keep the central `fraction` of each spatial dim — reference
    tf.image.central_crop semantics (dataset_preprocessing.py:264-265)."""
    h, w = img.shape[:2]
    dh = int(np.floor(h * (1.0 - fraction) / 2.0))
    dw = int(np.floor(w * (1.0 - fraction) / 2.0))
    return img[dh : h - dh, dw : w - dw]


def draw_bbox(
    img: np.ndarray,
    y0: int,
    x0: int,
    y1: int,
    x1: int,
    color: tuple[int, int, int] = (255, 0, 0),
) -> np.ndarray:
    """Draw a 1-px bounding-box outline (reference M11 debug viz,
    dataset_preprocessing.py:193-231 tf.image.draw_bounding_boxes).
    Corners are inclusive; returns a copy."""
    h, w = img.shape[:2]
    if not (0 <= y0 <= y1 < h and 0 <= x0 <= x1 < w):
        raise ValueError(f"bbox ({y0},{x0},{y1},{x1}) outside image ({h},{w})")
    out = img.copy()
    c = np.asarray(color, dtype=img.dtype)
    out[y0, x0 : x1 + 1] = c
    out[y1, x0 : x1 + 1] = c
    out[y0 : y1 + 1, x0] = c
    out[y0 : y1 + 1, x1] = c
    return out


def distorted_crop(
    img: np.ndarray,
    rng: np.random.Generator,
    area_range: tuple[float, float] = (0.05, 1.0),
    aspect_ratio_range: tuple[float, float] = (0.75, 1.33),
    max_attempts: int = 100,
) -> np.ndarray:
    """Rejection-sample a crop window with area/aspect constraints —
    numpy re-implementation of tf.image.sample_distorted_bounding_box +
    tf.slice (reference dataset_preprocessing.py:99-153). Falls back to
    the full image when no attempt fits (TF behavior)."""
    h, w = img.shape[:2]
    area = float(h) * float(w)
    for _ in range(max_attempts):
        target_area = rng.uniform(*area_range) * area
        aspect = rng.uniform(*aspect_ratio_range)
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            y = int(rng.integers(0, h - ch + 1))
            x = int(rng.integers(0, w - cw + 1))
            return img[y : y + ch, x : x + cw]
    return img


# --------------------------------------------------------------------------
# Color jitter (reference M6 distort_color) — float images in [0, 1]
# --------------------------------------------------------------------------
def _rgb_to_hsv(rgb: np.ndarray) -> np.ndarray:
    mx = rgb.max(axis=-1)
    mn = rgb.min(axis=-1)
    diff = mx - mn
    safe = np.where(diff == 0, 1.0, diff)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    h = np.where(
        mx == r, (g - b) / safe % 6.0, np.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0)
    )
    h = np.where(diff == 0, 0.0, h) / 6.0
    s = np.where(mx == 0, 0.0, diff / np.where(mx == 0, 1.0, mx))
    return np.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = np.floor(h).astype(np.int64) % 6
    f = h - np.floor(h)
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    choices = np.stack(
        [
            np.stack([v, t, p], -1),
            np.stack([q, v, p], -1),
            np.stack([p, v, t], -1),
            np.stack([p, q, v], -1),
            np.stack([t, p, v], -1),
            np.stack([v, p, q], -1),
        ],
        axis=0,
    )
    return np.take_along_axis(choices, i[None, ..., None], axis=0)[0]


def adjust_brightness(img: np.ndarray, delta: float) -> np.ndarray:
    return img + delta


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    mean = img.mean(axis=(0, 1), keepdims=True)
    return (img - mean) * factor + mean


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    hsv = _rgb_to_hsv(np.clip(img, 0.0, 1.0))
    hsv[..., 1] = np.clip(hsv[..., 1] * factor, 0.0, 1.0)
    return _hsv_to_rgb(hsv)


def adjust_hue(img: np.ndarray, delta: float) -> np.ndarray:
    hsv = _rgb_to_hsv(np.clip(img, 0.0, 1.0))
    hsv[..., 0] = (hsv[..., 0] + delta) % 1.0
    return _hsv_to_rgb(hsv)


def distort_color(img: np.ndarray, ordering: int, rng: np.random.Generator) -> np.ndarray:
    """One of 4 jitter orderings, parameters drawn as in the reference
    (dataset_preprocessing.py:45-96), clipped to [0, 1] at the end."""
    b = lambda x: adjust_brightness(x, rng.uniform(-32.0 / 255.0, 32.0 / 255.0))  # noqa: E731
    s = lambda x: adjust_saturation(x, rng.uniform(0.5, 1.5))  # noqa: E731
    h = lambda x: adjust_hue(x, rng.uniform(-0.2, 0.2))  # noqa: E731
    c = lambda x: adjust_contrast(x, rng.uniform(0.5, 1.5))  # noqa: E731
    orders = [(b, s, h, c), (s, b, c, h), (c, h, b, s), (h, s, c, b)]
    for fn in orders[ordering % 4]:
        img = fn(img)
    return np.clip(img, 0.0, 1.0)


# --------------------------------------------------------------------------
# Fused preprocess pipelines (reference M2 / M9)
# --------------------------------------------------------------------------
def preprocess_for_train(
    img_u8: np.ndarray, rng: np.random.Generator, out_h: int, out_w: int
) -> tuple[np.ndarray, dict]:
    """Train-time augment: distorted crop -> resize (random method) ->
    random flip -> color jitter (random ordering) -> [-1, 1]. One fused
    kernel per record (reference dataset_preprocessing.py:156-234); the
    whole chain runs inside a single pandas-UDF stage so Arrow moves each
    image exactly once."""
    img = img_u8.astype(np.float32) / 255.0  # convert_image_dtype (P4)
    cropped = distorted_crop(img, rng)
    meta = {"crop_h": cropped.shape[0], "crop_w": cropped.shape[1]}
    method = int(rng.integers(0, 2))  # apply_with_random_selector (M7)
    meta["resize_method"] = method
    if method == 0:
        img = resize_bilinear(cropped, out_h, out_w)
    else:
        img = resize_nearest(cropped, out_h, out_w).astype(np.float32)
    flip = bool(rng.random() < 0.5)
    meta["flipped"] = flip
    if flip:
        img = np.fliplr(img)
    ordering = int(rng.integers(0, 4))
    meta["color_ordering"] = ordering
    img = distort_color(img, ordering, rng)
    return (img - 0.5) * 2.0, meta  # M8: [-1, 1]


def preprocess_for_eval(img_u8: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Eval path: central crop 0.875 -> bilinear resize -> [0, 1].
    Deterministic; the reference leaves the [-1,1] shift commented out on
    the eval path (dataset_preprocessing.py:273-275)."""
    img = img_u8.astype(np.float32) / 255.0
    img = central_crop(img, 0.875)
    return resize_bilinear(img, out_h, out_w)
