"""Cuckoo-filter variant of the URL-seen sidecar (engine/cuckoo.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import cuckoo
from engine import seen as seenmod


def _rand_hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_roundtrip_no_false_negatives():
    items = _rand_hashes(20000, 1)
    table = cuckoo.new_table(8192)  # 32768 slots, 61% load
    stash = cuckoo.insert_many(table, np.array([], dtype=np.int64), items)
    assert cuckoo.probe_many(table, stash, items).all()


def test_fpr_below_bloom_equivalent():
    """16-bit fingerprints: FPR ~ 2*4/2^16 ~ 0.012% — far below the 5%
    bloom bound at comparable bits."""
    items = _rand_hashes(20000, 2)
    table = cuckoo.new_table(8192)
    stash = cuckoo.insert_many(table, np.array([], dtype=np.int64), items)
    probe = _rand_hashes(100000, 3)
    fresh = probe[~np.isin(probe, items)]
    fpr = cuckoo.probe_many(table, stash, fresh).mean()
    assert fpr < 0.005


def test_deletion():
    items = _rand_hashes(5000, 4)
    table = cuckoo.new_table(4096)
    stash = cuckoo.insert_many(table, np.array([], dtype=np.int64), items)
    gone, kept = items[:2500], items[2500:]
    stash = cuckoo.delete_many(table, stash, gone)
    assert cuckoo.probe_many(table, stash, kept).all()  # no collateral FNs
    # deleted items mostly gone (fp collisions with kept items allowed)
    assert cuckoo.probe_many(table, stash, gone).mean() < 0.4


def test_blob_serialization_roundtrip():
    items = _rand_hashes(1000, 5)
    table = cuckoo.new_table(1024)
    stash = cuckoo.insert_many(table, np.array([], dtype=np.int64), items)
    t2, s2 = cuckoo.from_blob(cuckoo.to_blob(table, stash), 1024)
    assert (t2 == table).all() and (s2 == stash).all()
    assert cuckoo.probe_many(t2, s2, items).all()


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_spark_filter_roundtrip_both_kinds(spark, kind):
    """init -> probe -> update -> probe through the Spark cogroup path;
    zero false negatives for both filter kinds."""
    nbits = 1 << 20
    keys = spark.range(0, 20000).select(F.xxhash64("id").alias("url_hash"))
    blobs = seenmod.init_filter(spark, keys, n_parts=4, nbits=nbits, kind=kind)
    probed = seenmod.probe_filter(keys, blobs, n_parts=4)
    assert probed.where(~F.col("maybe_seen")).count() == 0  # no FNs
    new = spark.range(20000, 25000).select(F.xxhash64("id").alias("url_hash"))
    blobs2 = seenmod.update_filter(blobs, new, n_parts=4, epoch=1)
    assert blobs2.select("kind").distinct().collect()[0]["kind"] == kind
    probed2 = seenmod.probe_filter(new, blobs2, n_parts=4)
    assert probed2.where(~F.col("maybe_seen")).count() == 0


def test_delete_from_filter_roundtrip(spark):
    """Retire-hashes flow through the Spark cogroup path (seen.py D3⁻¹):
    kept hashes keep zero FNs; deleted hashes drop back below the FPR
    band; re-inserting a retired hash (the recrawl flow) probes positive
    again."""
    keys = spark.range(0, 20000).select(F.xxhash64("id").alias("url_hash"))
    gone = keys.where(F.pmod("url_hash", F.lit(2)) == 0)
    kept = keys.where(F.pmod("url_hash", F.lit(2)) != 0)
    blobs = seenmod.init_filter(spark, keys, n_parts=4, nbits=1 << 21, kind="cuckoo")
    blobs2 = seenmod.delete_from_filter(blobs, gone, n_parts=4, epoch=2).persist()
    assert seenmod.probe_filter(kept, blobs2, n_parts=4).where(
        ~F.col("maybe_seen")
    ).count() == 0  # no collateral FNs
    hit_rate = (
        seenmod.probe_filter(gone, blobs2, n_parts=4)
        .agg(F.avg(F.col("maybe_seen").cast("double")))
        .collect()[0][0]
    )
    assert hit_rate < 0.05  # deleted items gone (fp collisions allowed)
    blobs3 = seenmod.update_filter(blobs2, gone, n_parts=4, epoch=3)
    assert seenmod.probe_filter(gone, blobs3, n_parts=4).where(
        ~F.col("maybe_seen")
    ).count() == 0  # recrawl re-insert restores membership
    blobs2.unpersist()


def test_delete_from_filter_rejects_bloom(spark):
    keys = spark.range(0, 100).select(F.xxhash64("id").alias("url_hash"))
    blobs = seenmod.init_filter(spark, keys, n_parts=2, nbits=1 << 16, kind="bloom")
    with pytest.raises(Exception, match="cuckoo"):
        seenmod.delete_from_filter(blobs, keys, n_parts=2, epoch=1).collect()


def test_non_pow2_nb_rejected():
    """alt = b XOR H(fp) is an involution only for power-of-two nb; any
    other nb silently produced false negatives (7/17000 at nb=7000 before
    the guard), and a seen-filter FN bypasses the exact D2 anti-join."""
    import pytest

    for nb in (7000, 6000, 3, 12):
        with pytest.raises(ValueError):
            cuckoo.new_table(nb)
    assert cuckoo.round_down_pow2(7000) == 4096
    assert cuckoo.round_down_pow2(4096) == 4096
    assert cuckoo.round_down_pow2(1) == 1


def test_no_false_negatives_at_derived_nb():
    """seen.py derives nb from an arbitrary public nbits arg: the pow2
    round-down must keep the no-FN guarantee for awkward nbits values."""
    from engine.seen import _build_blob, _probe_blob

    from engine.cuckoo import FP_BITS, SLOTS, round_down_pow2

    rng = np.random.default_rng(7)
    for nbits in ((1 << 22) - 8192, 7000 * 64, 6000 * 64):
        cap = round_down_pow2(nbits // (FP_BITS * SLOTS)) * SLOTS
        items = rng.integers(-(2**62), 2**62, int(cap * 0.6), dtype=np.int64)
        blob = _build_blob("cuckoo", nbits, 5, items)
        assert _probe_blob("cuckoo", nbits, 5, blob, items).all(), nbits
