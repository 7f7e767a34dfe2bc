"""Image/media codecs for the binary-column pipeline.

The reference decodes JPEG/PNG via TF graph ops (reference:
make_tf_record.py:18-19, data_queue.py:29, tutorial nb cell 6). This
container ships no image libraries, so the engine's REAL, fully-tested
codec is PPM (P6) — a trivial uncompressed raster format implementable in
pure numpy — and JPEG/PNG decode is gated behind an import-try on Pillow
with a clearly-marked NotImplementedError fallback. The Spark-side
plumbing (binary column in, decode inside an Arrow-batched pandas UDF,
ndarray out) is identical for every format; swapping the PPM branch for a
real JPEG decoder on a cluster with Pillow installed changes one function.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - not installed in this container
    from PIL import Image as _PILImage  # type: ignore

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _PILImage = None
    _HAVE_PIL = False


# --------------------------------------------------------------------------
# PPM (P6): the engine's native uncompressed raster codec.
# Layout: b"P6\n<width> <height>\n255\n" + height rows of width*3 bytes.
# --------------------------------------------------------------------------
def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM (P6)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) array, got shape {img.shape}")
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8, got {img.dtype}")
    h, w = img.shape[:2]
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6) bytes to an (H, W, 3) uint8 array."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header is three whitespace-separated tokens after the magic
    parts = data.split(b"\n", 3)
    if len(parts) < 4:
        raise ValueError("truncated PPM header")
    dims = parts[1].split()
    w, h = int(dims[0]), int(dims[1])
    maxval = int(parts[2])
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raw = parts[3]
    n = h * w * 3
    if len(raw) < n:
        raise ValueError(f"PPM payload too short: {len(raw)} < {n}")
    return np.frombuffer(raw[:n], dtype=np.uint8).reshape(h, w, 3)


def ppm_n_bytes(height: int, width: int) -> int:
    """Exact encoded size of a P6 payload — header + raw pixels. Kept as a
    plain arithmetic function so the DuckDB oracle can compute the same
    value in SQL (q80)."""
    # b"P6\n" (3) + str(w) + b" " (1) + str(h) + b"\n" (1) + b"255\n" (4)
    return 9 + len(str(width)) + len(str(height)) + 3 * height * width


# --------------------------------------------------------------------------
# Compressed formats: real path only when Pillow exists on the cluster.
# --------------------------------------------------------------------------
def decode_image(data: bytes, image_format: str) -> np.ndarray:
    """Decode an encoded image payload to (H, W, 3) uint8.

    Reference analog: tf.image.decode_jpeg / decode_png
    (make_tf_record.py:18-19, tutorial nb cell 6). PPM is always
    available; jpeg/png require Pillow (STUB: NotImplementedError when the
    library is absent, as in this container).
    """
    fmt = image_format.lower()
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt in ("jpg", "jpeg", "png"):
        if _HAVE_PIL:  # pragma: no cover - not installed in this container
            import io

            arr = np.asarray(_PILImage.open(io.BytesIO(data)).convert("RGB"))
            return arr.astype(np.uint8)
        raise NotImplementedError(
            f"{fmt} decode requires Pillow, which is not installed in this "
            "environment; the PPM branch exercises the identical Spark "
            "plumbing (binary column -> pandas-UDF decode -> ndarray)"
        )
    raise ValueError(f"unknown image format {image_format!r}")


def image_dims(data: bytes, image_format: str) -> tuple[int, int]:
    """(height, width) probe — reference ImageReader.read_image_dims
    (make_tf_record.py:21-23)."""
    arr = decode_image(data, image_format)
    return int(arr.shape[0]), int(arr.shape[1])
