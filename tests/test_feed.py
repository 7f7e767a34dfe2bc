"""Training-feed surface tests (reference B1-B7 invariants) and the
golden end-to-end pipeline hash (SURVEY.md §5.4): corpus -> sharded ETL
-> scan -> seeded augment -> batch, hashed and pinned."""

from __future__ import annotations

import hashlib

import numpy as np

from tests.conftest import SF_SMOKE
from tf_datapipeline_spark.operators.feed import batch_iterator
from tf_datapipeline_spark.sources.etl import (
    read_records,
    scratch_dir,
    write_sharded_records,
)
from tf_datapipeline_spark.sources.images import synthetic_corpus

_OUT = 16
_BATCH = 32

# sha256 of every (pixels, labels) batch of one deterministic feed epoch
# over the sf0.001 validation split — pins codec + split + shuffle +
# augment + batching end-to-end. Recompute ONLY for an intentional
# semantic change (see test_golden_pipeline_hash).
# Recomputed 2026-08-13: feed keys now derive from the unique record path
# instead of the payload hash (duplicate payloads previously shared RNG
# streams and tied sort keys).
GOLDEN_FEED_HASH = "33eab21624851ff14fdccc1c9fbcadffecba3a24d53915a697d80108b471932b"


def _records(spark):
    out = scratch_dir("etl_feed")
    write_sharded_records(synthetic_corpus(spark, SF_SMOKE), out)
    return read_records(spark, out).filter("split = 'validation'")


def _feed_hash(spark) -> tuple[str, int, list[int]]:
    h = hashlib.sha256()
    n = 0
    batch_sizes = []
    for epoch, images, labels in batch_iterator(
        _records(spark), _BATCH, _OUT, _OUT, epochs=1, seed=0
    ):
        assert images.dtype == np.float32
        assert images.shape[1:] == (_OUT, _OUT, 3)
        assert images.min() >= -1.0 - 1e-6 and images.max() <= 1.0 + 1e-6
        h.update(images.tobytes())
        h.update(labels.tobytes())
        batch_sizes.append(len(labels))
        n += len(labels)
    return h.hexdigest(), n, batch_sizes


def test_feed_epoch_cardinality_and_ragged_tail(spark):
    rec = _records(spark)
    n_rec = rec.count()
    digest, n, sizes = _feed_hash(spark)
    assert n == n_rec  # one epoch visits every record exactly once (B3)
    assert all(s == _BATCH for s in sizes[:-1])  # full batches (B1)
    assert sizes[-1] == n_rec - _BATCH * (len(sizes) - 1)  # ragged tail (B2)


def test_feed_is_deterministic_across_runs(spark):
    a, _, _ = _feed_hash(spark)
    b, _, _ = _feed_hash(spark)
    assert a == b


def test_epochs_reshuffle_deterministically(spark):
    rec = _records(spark)
    orders = {}
    for epoch, images, labels in batch_iterator(
        rec, _BATCH, _OUT, _OUT, epochs=2, seed=0, is_training=False
    ):
        orders.setdefault(epoch, []).extend(labels.tolist())
    assert set(orders) == {0, 1}
    # same membership, different visit order per epoch (R1/R3)
    assert sorted(orders[0]) == sorted(orders[1])
    assert orders[0] != orders[1]


def test_golden_pipeline_hash(spark):
    digest, _, _ = _feed_hash(spark)
    if GOLDEN_FEED_HASH == "__RECOMPUTE__":
        raise AssertionError(f"pin me: {digest}")
    assert digest == GOLDEN_FEED_HASH
