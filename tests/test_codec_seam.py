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
