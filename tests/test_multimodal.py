"""Unit + invariant tests for the binary/multimodal pipeline (SURVEY.md §5:
the invariants the reference only ever eyeballed, automated)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE
from tf_datapipeline_spark.functions.imagecodec import (
    decode_image,
    decode_ppm,
    encode_ppm,
    ppm_n_bytes,
)
from tf_datapipeline_spark.functions.imageops import (
    central_crop,
    preprocess_for_eval,
    preprocess_for_train,
    resize_bilinear,
    resize_nearest,
    rng_for_row,
)
from tf_datapipeline_spark.sources.etl import (
    read_records,
    scratch_dir,
    write_sharded_records,
)
from tf_datapipeline_spark.sources.images import (
    scan_image_dir,
    synthetic_corpus,
    synthetic_pixels,
)


# --------------------------------------------------------------------------
# codec
# --------------------------------------------------------------------------
@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31),
)
def test_ppm_roundtrip(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_ppm(img)
    assert len(data) == ppm_n_bytes(h, w)
    out = decode_ppm(data)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, img)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_ppm(b"nope")


# --------------------------------------------------------------------------
# baseline JPEG codec (functions/jpegcodec.py — reference S3,
# make_tf_record.py:18-19)
# --------------------------------------------------------------------------
def test_jpeg_flat_block_roundtrip_is_bit_exact():
    """Flat 8x8 blocks -> DC-only DCT -> quality-100 roundtrip loses
    nothing. This is the property the q8d oracle relies on."""
    from tf_datapipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg
    from tf_datapipeline_spark.sources.images import synthetic_jpeg_pixels

    for doc_id in (0, 1, 7, 123, 4096):
        gray = synthetic_jpeg_pixels(doc_id)
        out = decode_jpeg(encode_jpeg(gray, quality=100))
        assert out.shape == (*gray.shape, 3)
        assert np.array_equal(out[:, :, 0], gray)
        assert np.array_equal(out[:, :, 0], out[:, :, 1])
        assert np.array_equal(out[:, :, 1], out[:, :, 2])


def test_jpeg_truncated_stream_raises_valueerror():
    """Malformed input contract (r9 advice): cutting the entropy stream
    at ANY byte must raise ValueError — never IndexError. The decoder
    zero-pads to the worst-case single-block overrun (~260 bytes, one
    block of max-width codes past the end) so the per-block truncation
    check always fires before the window array runs out, even with
    huffman tables whose all-zero peek decodes."""
    from tf_datapipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    enc = encode_jpeg(img, quality=75)
    # cut inside the entropy segment (past all headers, before EOI)
    sos = enc.find(b"\xff\xda")
    assert sos > 0
    for cut in range(sos + 20, len(enc) - 2, 7):
        with pytest.raises(ValueError):
            decode_jpeg(enc[:cut])


@settings(max_examples=15, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40), seed=st.integers(0, 2**31))
def test_jpeg_gray_roundtrip_tolerance(h, w, seed):
    """Arbitrary grayscale at quality=100: only float-DCT rounding remains
    (|err| <= 2), and non-multiple-of-8 dims crop back exactly."""
    from tf_datapipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (h, w, 3)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 2


@settings(max_examples=10, deadline=None)
@given(h=st.integers(1, 32), w=st.integers(1, 32), seed=st.integers(0, 2**31))
def test_jpeg_rgb_roundtrip_tolerance(h, w, seed):
    """4:4:4 color at quality=100: YCbCr transform + DCT rounding only."""
    from tf_datapipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (h, w, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_lower_quality_decodes_with_exact_dims():
    from tf_datapipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    img = np.random.default_rng(3).integers(0, 256, size=(33, 22, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    assert out.shape == (33, 22, 3)
    assert abs(float(out.mean()) - float(img.mean())) < 8.0


def test_jpeg_engine_matches_independent_decoder():
    """r4 verdict task 6: decode non-trivial content (gradient AND noise,
    4:4:4 AND 4:2:0, three quality levels) with the engine codec and a
    SEPARATELY-derived reference decoder (tests/jpeg_independent.py: own
    marker parse, own T.81 F.2.2.3 canonical-huffman walk, own stuffed
    bit reader, diagonal-walk zigzag, direct O(N^4) Annex A.3.3 IDCT —
    no shared code) and pin max-abs-diff <= 1 (IDCT rounding tolerance;
    measured 0 on all 12 fixtures)."""
    from tests.jpeg_independent import decode_jpeg_reference
    from tf_datapipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:37, 0:29]
    grad = np.stack(
        [(yy * 3 + xx * 2) % 256, (yy * 5) % 256, (xx * 7) % 256], axis=-1
    ).astype(np.uint8)
    noise = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    for img in (grad, noise):
        for sub in ("444", "420"):
            for q in (100, 75, 50):
                data = encode_jpeg(img, quality=q, subsampling=sub)
                a = decode_jpeg(data).astype(int)
                b = decode_jpeg_reference(data).astype(int)
                assert a.shape == b.shape == img.shape
                assert np.abs(a - b).max() <= 1, (sub, q)
    gray = rng.integers(0, 256, (19, 22), dtype=np.uint8)
    data = encode_jpeg(gray, quality=90)
    assert np.abs(
        decode_jpeg(data).astype(int)
        - decode_jpeg_reference(data).astype(int)
    ).max() <= 1


def test_jpeg_restart_markers_roundtrip_and_match_independent():
    """DRI/RSTn path (exercised by the r9 fast entropy decoder's
    unstuffing + MCU-count restart arithmetic): a stream encoded with
    restart markers must decode to EXACTLY the pixels of the same image
    encoded without them (identical quantized coefficients — only the
    entropy framing differs), and must agree with the independently
    derived reference decoder, for gray, 4:4:4 and 4:2:0, at interval 1
    (every MCU restarts, all 8 RSTn values cycle) and 3 (partial-byte
    alignment padding before most markers)."""
    from tests.jpeg_independent import decode_jpeg_reference
    from tf_datapipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(29)
    gray = rng.integers(0, 256, (35, 41), dtype=np.uint8)
    rgb = rng.integers(0, 256, (26, 50, 3), dtype=np.uint8)
    cases = [
        (gray, {"quality": 80}),
        (rgb, {"quality": 75, "subsampling": "444"}),
        (rgb, {"quality": 75, "subsampling": "420"}),
    ]
    for img, kw in cases:
        plain = decode_jpeg(encode_jpeg(img, **kw))
        for ri in (1, 3):
            data = encode_jpeg(img, restart_interval=ri, **kw)
            assert b"\xff\xdd" in data  # DRI segment present
            got = decode_jpeg(data)
            assert np.array_equal(got, plain), (kw, ri)
            ref = decode_jpeg_reference(data)
            assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1, (kw, ri)


def test_jpeg_420_chroma_constant_roundtrip_is_exact():
    """r=g=b content has constant chroma planes (Cb=Cr=128), so the 2x2
    box subsample and replication upsample are both lossless and the
    4:2:0 quality-100 roundtrip must reproduce every pixel exactly —
    isolates the subsampling path from DCT loss."""
    from tf_datapipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:37, 0:29]
    g = np.repeat(
        ((yy * 3 + xx * 5) % 256)[:, :, None].astype(np.uint8), 3, axis=2
    )
    out = decode_jpeg(encode_jpeg(g, quality=100, subsampling="420"))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 1


@settings(max_examples=10, deadline=None)
@given(h=st.integers(1, 33), w=st.integers(1, 33), seed=st.integers(0, 2**31))
def test_jpeg_420_roundtrip_dims_and_smooth_tolerance(h, w, seed):
    """4:2:0 at any dims (incl. non-multiples of 16) crops back exactly.
    Pixel tolerance is asserted on SMOOTH content only: on noise the 2x2
    chroma box filter legitimately loses tens of levels (and RGB clamping
    then couples that into recomputed luma), but on a low-frequency
    gradient the subsample+replicate error stays within a few levels."""
    from tf_datapipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    noise = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=100, subsampling="420"))
    assert out.shape == (h, w, 3)

    a, b, c = (int(x) for x in rng.integers(1, 4, 3))
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = np.stack(
        [
            np.clip(60 + a * yy + b * xx, 0, 255),
            np.clip(90 + b * yy, 0, 255),
            np.clip(120 + c * xx, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(smooth, quality=100, subsampling="420"))
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 8


def test_jpeg_rejects_non_baseline_and_garbage():
    from tf_datapipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    # flip SOF0 -> SOF2 (progressive): decoder must refuse, not mis-decode
    data = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(data))


def test_decode_image_routes_jpeg_to_builtin_codec():
    from tf_datapipeline_spark.functions.jpegcodec import encode_jpeg

    img = np.full((16, 16), 77, dtype=np.uint8)
    out = decode_image(encode_jpeg(img, quality=100), "jpeg")
    assert (out == 77).all() and out.shape == (16, 16, 3)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip(h, w, seed):
    """PNG encode cycles all 5 filter types across rows; decode must
    reconstruct every byte."""
    from tf_datapipeline_spark.functions.imagecodec import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, img)


def test_png_crc_and_garbage_rejected():
    from tf_datapipeline_spark.functions.imagecodec import decode_png, encode_png

    with pytest.raises(ValueError):
        decode_png(b"not a png")
    data = bytearray(encode_png(synthetic_pixels(7)))
    data[40] ^= 0xFF  # corrupt inside IDAT -> CRC must catch it
    with pytest.raises(ValueError):
        decode_png(bytes(data))


# --------------------------------------------------------------------------
# image kernels (reference invariants: shape / dtype / range / determinism)
# --------------------------------------------------------------------------
def _img(h=24, w=30, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_resize_constant_image_is_identity_value():
    img = np.full((10, 7, 3), 113, dtype=np.uint8)
    bl = resize_bilinear(img, 5, 5)
    nn = resize_nearest(img, 5, 5)
    assert np.allclose(bl, 113.0)
    assert (nn == 113).all() and nn.shape == (5, 5, 3)


def test_bilinear_matches_nearest_on_integer_upscale_grid():
    img = _img(8, 8)
    out = resize_bilinear(img, 16, 16)
    assert out.shape == (16, 16, 3)
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_central_crop_fraction():
    img = _img(32, 32)
    out = central_crop(img, 0.875)
    assert out.shape == (28, 28, 3)  # floor(32*0.0625)=2 off each side


def test_train_augment_invariants():
    img = _img()
    out, meta = preprocess_for_train(img, rng_for_row(42, 7), 32, 32)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    assert 1 <= meta["crop_h"] <= 24 and 1 <= meta["crop_w"] <= 30


def test_train_augment_seed_determinism_and_variation():
    img = _img()
    a, _ = preprocess_for_train(img, rng_for_row(42, 7), 32, 32)
    b, _ = preprocess_for_train(img, rng_for_row(42, 7), 32, 32)
    c, _ = preprocess_for_train(img, rng_for_row(42, 8), 32, 32)
    assert np.array_equal(a, b)  # same (seed, row) -> identical (retry-safe)
    assert not np.array_equal(a, c)  # different row -> different augment


def test_eval_preprocess_deterministic_range01():
    img = _img()
    a = preprocess_for_eval(img, 32, 32)
    b = preprocess_for_eval(img, 32, 32)
    assert np.array_equal(a, b)
    assert a.shape == (32, 32, 3)
    assert a.min() >= 0.0 and a.max() <= 1.0


# --------------------------------------------------------------------------
# sources: binaryFile dir scan (real directory) + synthetic corpus
# --------------------------------------------------------------------------
def test_scan_image_dir_binaryfile(spark):
    root = scratch_dir("corpus_dir/ignored")
    root = root.rsplit("/", 1)[0]
    import os

    for cls in ("daisy", "tulip"):
        os.makedirs(os.path.join(root, cls), exist_ok=True)
        for i in range(3):
            img = np.full((4 + i, 5, 3), i, dtype=np.uint8)
            with open(os.path.join(root, cls, f"{i}.ppm"), "wb") as f:
                f.write(encode_ppm(img))
    df = scan_image_dir(spark, root)
    rows = df.collect()
    assert len(rows) == 6
    assert {r.class_name for r in rows} == {"daisy", "tulip"}
    one = next(r for r in rows if r.class_name == "daisy" and r.path.endswith("2.ppm"))
    assert decode_ppm(bytes(one.content)).shape == (6, 5, 3)


def test_synthetic_corpus_payloads_decode(spark):
    df = synthetic_corpus(spark, SF_SMOKE).limit(20)
    for r in df.collect():
        arr = decode_ppm(bytes(r.content))
        assert arr.shape == (r.height, r.width, 3)
        doc_id = int(r.path.rsplit("/", 1)[1].split(".")[0])
        assert np.array_equal(arr, synthetic_pixels(doc_id))
        assert r.length == len(bytes(r.content))


# --------------------------------------------------------------------------
# ETL writer round-trip (reference EP4 invariants: shard count, split
# sizes, label range, payload integrity)
# --------------------------------------------------------------------------
def test_etl_sharded_write_roundtrip(spark):
    corpus = synthetic_corpus(spark, SF_SMOKE)
    n_corpus = corpus.count()
    total_payload = corpus.selectExpr("sum(length(content)) s").collect()[0].s
    n_classes = corpus.select("class_name").distinct().count()

    out = scratch_dir("etl_test")
    write_sharded_records(corpus, out)
    rec = read_records(spark, out)

    assert rec.count() == n_corpus
    by_split = {r.split: r for r in rec.groupBy("split").count().collect()}
    assert set(by_split) == {"train", "validation"}
    # ~10% validation via permutation-key modulo
    frac = by_split["validation"]["count"] / n_corpus
    assert 0.04 < frac < 0.2
    shards = {r.shard for r in rec.select("shard").distinct().collect()}
    assert shards == {0, 1, 2, 3, 4}
    labels = rec.selectExpr("min(label) mn", "max(label) mx").collect()[0]
    assert labels.mn == 0 and labels.mx == n_classes - 1
    assert rec.selectExpr("sum(length(image_encoded)) s").collect()[0].s == total_payload
    # re-decodability straight out of the record table
    sample = rec.limit(3).collect()
    for r in sample:
        arr = decode_ppm(bytes(r.image_encoded))
        assert arr.shape == (r.height, r.width, 3)
