"""Unit tests for the native TFRecord container (sources/tfrecord.py):
CRC32C against published check vectors, protobuf Example round-trips,
frame-level corruption detection, and the Spark write/read round-trip.
The oracle-level audit is q8h in tests/test_oracle_parity.py."""

from __future__ import annotations

import struct

import pytest

from tests.conftest import SF_SMOKE
from tf_datapipeline_spark.sources.tfrecord import (
    crc32c,
    decode_example,
    encode_example,
    iter_tfrecord_frames,
    masked_crc32c,
    write_tfrecord_file,
)


def test_crc32c_check_vectors():
    # RFC 3720 / Castagnoli published check values
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_masked_crc_is_involution_free():
    # masking must move the value (that is its whole purpose)
    data = b"payload"
    assert masked_crc32c(data) != crc32c(data)


def test_example_roundtrip_reference_schema():
    # the exact feature set the reference writes (make_tf_record.py:85-92)
    feats = {
        "image/encoded": b"\x00\x01\xff" * 100,
        "image/format": "ppm",
        "image/class/label": 3,
        "image/height": 33,
        "image/width": 17,
    }
    got = decode_example(encode_example(feats))
    assert got["image/encoded"] == [feats["image/encoded"]]
    assert got["image/format"] == [b"ppm"]
    assert got["image/class/label"] == [3]
    assert got["image/height"] == [33]
    assert got["image/width"] == [17]


def test_example_roundtrip_lists_and_floats():
    feats = {"ints": [0, 1, 127, 128, 300, 2**40], "floats": [0.5, -2.25, 1e10]}
    got = decode_example(encode_example(feats))
    assert got["ints"] == feats["ints"]
    assert got["floats"] == [struct.unpack("<f", struct.pack("<f", v))[0]
                             for v in feats["floats"]]


def test_example_negative_int64():
    """Negatives use the standard protobuf wire form (64-bit two's
    complement as a 10-byte varint) on encode, and decode sign-extends —
    external reference shards with negative Int64List values must not
    surface as huge unsigned positives."""
    feats = {"v": [-5, -1, 0, 5, -(2**63), 2**63 - 1]}
    assert decode_example(encode_example(feats))["v"] == feats["v"]

    # wire-level pin: an externally-encoded -5 (what any standard protobuf
    # encoder emits for Int64List [-5]) decodes to -5
    two_c = (-5) & (2**64 - 1)
    out = bytearray()
    n = two_c
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            break
    assert len(out) == 10  # negatives are always 10-byte varints
    packed = bytes([0x0A, len(out)]) + bytes(out)      # Int64List{1: packed}
    feat = bytes([0x1A, len(packed)]) + packed         # Feature{3: Int64List}
    key = b"\x0a\x01v"                                 # entry key "v"
    fval = bytes([0x12, len(feat)]) + feat             # entry value
    entry = bytes([0x0A, len(key + fval)]) + key + fval  # Features{1: entry}
    ex = bytes([0x0A, len(entry)]) + entry             # Example{1: Features}
    assert decode_example(ex)["v"] == [-5]


def test_example_mixed_list_is_floatlist():
    """A list containing any float must encode as FloatList — [1, 2.5]
    silently truncating to Int64List [1, 2] is data loss."""
    got = decode_example(encode_example({"v": [1, 2.5]}))
    assert got["v"] == [1.0, 2.5]
    # scalar float likewise
    assert decode_example(encode_example({"s": 2.5}))["s"] == [2.5]


def test_example_deterministic_bytes():
    feats = {"b": b"x", "a": 1}
    assert encode_example(feats) == encode_example(dict(reversed(feats.items())))


def test_frame_roundtrip_and_corruption(tmp_path):
    payloads = [b"alpha", b"", b"\x00" * 1000]
    path = str(tmp_path / "t.tfrecord")
    n, total = write_tfrecord_file(path, iter(payloads))
    assert n == 3
    buf = open(path, "rb").read()
    assert total == len(buf)
    assert list(iter_tfrecord_frames(buf)) == payloads

    # flip one payload byte -> the data CRC must catch it
    bad = bytearray(buf)
    bad[12] ^= 0xFF  # first byte of the first payload
    with pytest.raises(ValueError, match="CRC mismatch"):
        list(iter_tfrecord_frames(bytes(bad)))


def test_spark_tfrecord_roundtrip(spark, tmp_path):
    """Write the sf0.001 synthetic corpus as real .tfrecord shards, read
    it back, and check exact record-level equality with the source."""
    from pyspark.sql import functions as F

    from tf_datapipeline_spark.sources.etl import records_with_split
    from tf_datapipeline_spark.sources.images import synthetic_corpus
    from tf_datapipeline_spark.sources.tfrecord import (
        read_tfrecords,
        write_tfrecords,
    )

    records = records_with_split(synthetic_corpus(spark, SF_SMOKE))
    manifest = write_tfrecords(records, str(tmp_path)).collect()
    assert sum(m.n_records for m in manifest) == records.count()

    back = read_tfrecords(spark, str(tmp_path))
    key = ["split", "shard", "label", "height", "width", "payload_md5"]
    src = records.select(
        "split", "shard", "label", "height", "width",
        F.md5(F.col("image_encoded")).alias("payload_md5"),
    )
    got = back.select(
        "split", "shard", "label", "height", "width",
        F.md5(F.col("image_encoded")).alias("payload_md5"),
    )
    assert sorted(map(tuple, src.collect())) == sorted(map(tuple, got.collect()))
    assert got.select(key).distinct().count() == src.count() == got.count()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _feature = st.one_of(
        st.binary(max_size=64),
        st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1,
                 max_size=8),
    )

    @given(st.dictionaries(
        st.text(min_size=1, max_size=20).filter(lambda s: "\x00" not in s),
        _feature, max_size=6,
    ))
    @settings(max_examples=200, deadline=None)
    def test_example_roundtrip_property(feats):
        got = decode_example(encode_example(feats))
        assert set(got) == set(feats)
        for k, v in feats.items():
            assert got[k] == ([v] if isinstance(v, bytes) else v)
except ImportError:  # hypothesis is baked in, but stay import-safe
    pass
