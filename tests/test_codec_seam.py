"""The pluggable decoder seam (functions/codecseam.py, r9 verdict task 3).

Two tiers:
  1. Plumbing (always runs, no Pillow needed): arm registration,
     per-format dispatch with stdlib fallback, in-process switching, and
     that decode_image routes through the seam — exercised with a fake
     instrumented arm so the dispatch itself is observable.
  2. Equivalence gate (skipped unless Pillow is installed): the native
     arm must be BIT-identical to the stdlib verification reference on
     a property corpus before it may serve production decode — exact
     array equality for the lossless formats, and for JPEG only under
     the explicit SPARK_GRAFT_CODEC_JPEG=native opt-in.

Cluster note: the seam reads SPARK_GRAFT_CODEC per Python worker at
import, so the arm is switched fleet-wide via executor env, never by
mutating driver state; set_arm() here is the in-process test hook.
"""

from __future__ import annotations

import numpy as np
import pytest

from tf_datapipeline_spark.functions import codecseam, imagecodec


@pytest.fixture(autouse=True)
def _restore_arm():
    prev = codecseam.active_arm()
    yield
    codecseam.set_arm(prev)


def _rng_img(seed: int, h: int = 13, w: int = 17) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_stdlib_arm_covers_all_formats():
    assert set(codecseam.arms()["stdlib"]) == {"jpeg", "png", "ppm"}


def test_dispatch_and_fallback():
    calls = []

    def fake_png(data: bytes) -> np.ndarray:
        calls.append("png")
        return imagecodec.decode_png(data)

    codecseam.register_arm("fake-native", {"png": fake_png})
    codecseam.set_arm("fake-native")
    img = _rng_img(1)
    png = imagecodec.encode_png(img)
    ppm = imagecodec.encode_ppm(img)
    # covered format goes to the arm; result identical to the reference
    arm, dec = codecseam.decoder_for("png")
    assert arm == "fake-native"
    assert np.array_equal(imagecodec.decode_image(png, "png"), img)
    assert calls == ["png"]
    # uncovered format falls back to the stdlib reference
    arm, _ = codecseam.decoder_for("ppm")
    assert arm == "stdlib"
    assert np.array_equal(imagecodec.decode_image(ppm, "ppm"), img)
    # unknown format still raises through the seam
    with pytest.raises(ValueError, match="unknown image format"):
        imagecodec.decode_image(b"x", "webp")


def test_jpg_alias_maps_to_jpeg():
    arm, _ = codecseam.decoder_for("jpg")
    assert arm in ("stdlib", "native")


def test_default_arm_is_stdlib_reference():
    # goldens/oracles were frozen against the stdlib codecs; the default
    # configuration must keep decoding with them.
    codecseam.set_arm("stdlib")
    img = _rng_img(2)
    assert np.array_equal(
        imagecodec.decode_image(imagecodec.encode_png(img), "png"), img
    )


_HAVE_PIL = False
try:  # pragma: no cover - Pillow not installed in this container
    import PIL  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass


@pytest.mark.skipif(not _HAVE_PIL, reason="Pillow not installed")
def test_native_arm_equivalence_gate():  # pragma: no cover
    """THE swap gate: native decode must equal the stdlib reference
    bit-for-bit on every format it registers."""
    import os

    native = codecseam.arms().get("native", [])
    assert {"png", "ppm"} <= set(native)
    for seed in range(8):
        img = _rng_img(seed, h=5 + seed, w=7 + seed)
        for fmt, enc in (
            ("png", imagecodec.encode_png),
            ("ppm", imagecodec.encode_ppm),
        ):
            payload = enc(img)
            ref = codecseam._ARMS["stdlib"][fmt](payload)
            got = codecseam._ARMS["native"][fmt](payload)
            assert np.array_equal(ref, got), (fmt, seed)
    if os.environ.get("SPARK_GRAFT_CODEC_JPEG") == "native":
        from tf_datapipeline_spark.functions.jpegcodec import encode_jpeg

        for seed in range(4):
            img = _rng_img(seed, h=16, w=16)
            payload = encode_jpeg(img)
            ref = codecseam._ARMS["stdlib"]["jpeg"](payload)
            got = codecseam._ARMS["native"]["jpeg"](payload)
            assert np.array_equal(ref, got), (
                "Pillow JPEG decode differs from the T.81 reference on "
                "this host — the SPARK_GRAFT_CODEC_JPEG=native opt-in is "
                "not safe here"
            )


def test_sniffers_match_stdlib_accept_set():
    """Accept-set guard (r10 advice): the native arm's header sniffers
    must ACCEPT exactly what the stdlib reference decodes and REJECT
    exactly the variants it raises on — so flipping
    SPARK_GRAFT_CODEC=native never silently widens the accept set.
    Runs without Pillow: the sniffers are pure header parsers."""
    import struct
    import zlib

    from tf_datapipeline_spark.functions.jpegcodec import encode_jpeg

    # 1) every stdlib-decodable payload passes its sniffer
    for seed in range(4):
        img = _rng_img(seed, h=8 + seed, w=9 + seed)
        codecseam.sniff_png(imagecodec.encode_png(img))
        codecseam.sniff_ppm(imagecodec.encode_ppm(img))
        for sub in ("444", "420"):
            codecseam.sniff_jpeg(encode_jpeg(img, subsampling=sub))
        gray = img[:, :, :1]
        codecseam.sniff_jpeg(encode_jpeg(gray))

    # 2) crafted out-of-set variants: sniffer and stdlib decoder must
    # BOTH raise (pairwise, same variant)
    img = _rng_img(99, h=6, w=6)

    def png_with_ihdr(depth, color, interlace):
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">IIBBBBB", 6, 6, depth, color, 0, 0, interlace)
        chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        return sig + chunk

    bad_pngs = [
        png_with_ihdr(8, 0, 0),  # grayscale
        png_with_ihdr(8, 3, 0),  # palette
        png_with_ihdr(16, 2, 0),  # 16-bit
        png_with_ihdr(8, 2, 1),  # interlaced
    ]
    for payload in bad_pngs:
        with pytest.raises(ValueError):
            codecseam.sniff_png(payload)
        with pytest.raises(ValueError):
            imagecodec.decode_png(payload)

    ppm_p5 = b"P5\n6 6\n255\n" + bytes(36)  # grayscale PGM
    ppm_16 = b"P6\n6 6\n65535\n" + bytes(6 * 6 * 6)  # 16-bit maxval
    for payload in (ppm_p5, ppm_16):
        with pytest.raises(ValueError):
            codecseam.sniff_ppm(payload)
        with pytest.raises(ValueError):
            imagecodec.decode_ppm(payload)

    # progressive JPEG: rewrite the baseline's SOF0 marker to SOF2 —
    # header-identical otherwise, so the sniffer must key on the marker
    base = bytearray(encode_jpeg(img))
    sof0_at = bytes(base).find(b"\xff\xc0")
    assert sof0_at > 0
    base[sof0_at + 1] = 0xC2
    progressive = bytes(base)
    with pytest.raises(ValueError):
        codecseam.sniff_jpeg(progressive)
    from tf_datapipeline_spark.functions.jpegcodec import decode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(progressive)

    # 4-component (CMYK-shaped) SOF0: sniffer rejects like the decoder
    cmyk = bytearray(encode_jpeg(img))
    cmyk[sof0_at + 1] = 0xC0
    cmyk[sof0_at + 9] = 4  # ncomp byte inside SOF0
    cmyk = bytes(cmyk)
    with pytest.raises(ValueError):
        codecseam.sniff_jpeg(cmyk)
    with pytest.raises(ValueError):
        decode_jpeg(cmyk)
