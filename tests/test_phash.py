"""Perceptual-hash multimodal dedup (operators/multimodal.py):
signature locality, hamming-0 on identical payloads, banded recall,
and the mega-bucket guard.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkify_datalake_spark.operators.multimodal import (
    phash_dedup_pairs,
    phash_signatures,
)


def _payloads(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows], "doc_id long, payload binary"
    )


def _base_bytes() -> bytes:
    # structured payload: segment means vary, so the signature uses
    # many distinct bits
    return bytes((i * 7 + (i // 64) * 31) % 256 for i in range(4096))


def test_identical_payloads_hamming_zero(spark):
    b = _base_bytes()
    pairs = phash_dedup_pairs(
        _payloads(spark, [(1, b), (2, b)])
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs] == [
        (1, 2, 0)
    ]


def test_small_edit_stays_within_hamming_budget(spark):
    b = _base_bytes()
    edited = bytearray(b)
    for i in range(8):  # light corruption: 8 of 4096 bytes
        edited[i * 512] = (edited[i * 512] + 40) % 256
    pairs = phash_dedup_pairs(
        _payloads(spark, [(1, b), (2, bytes(edited))])
    ).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] <= 8


def test_unrelated_payloads_not_paired(spark):
    b1 = _base_bytes()
    b2 = bytes((i * 131 + 17) % 256 for i in range(4096))
    sigs = {
        r["doc_id"]: r["phash"]
        for r in phash_signatures(
            _payloads(spark, [(1, b1), (2, b2)])
        ).collect()
    }
    ham = bin((sigs[1] ^ sigs[2]) & ((1 << 64) - 1)).count("1")
    assert ham > 8  # signatures genuinely differ...
    pairs = phash_dedup_pairs(_payloads(spark, [(1, b1), (2, b2)])).collect()
    assert pairs == []  # ...and the verify stage filters any collision


def test_mega_bucket_cap_drops_degenerate_band(spark):
    # 60 identical payloads: every band bucket holds 60 > cap 50, so no
    # candidates survive the guard — the quadratic blowup never happens
    b = _base_bytes()
    frame = _payloads(spark, [(i, b) for i in range(60)])
    assert phash_dedup_pairs(frame).count() == 0
    # with the cap lifted the same frame pairs freely
    assert phash_dedup_pairs(frame, max_bucket=1000).count() == 60 * 59 // 2


def test_signature_kernel_is_deterministic(spark):
    frame = _payloads(
        spark, [(i, bytes((j * (i + 3)) % 256 for j in range(1000))) for i in range(20)]
    )
    s1 = sorted((r["doc_id"], r["phash"]) for r in phash_signatures(frame).collect())
    s2 = sorted((r["doc_id"], r["phash"]) for r in phash_signatures(frame).collect())
    assert s1 == s2


def test_registered_query_runs_on_fixture(spark, sf_dir):
    from sparkify_datalake_spark.registry import queries

    df = queries()["mm_dedup_phash"](spark, sf_dir)
    rows = df.collect()
    assert all(r["hamming"] <= 8 and r["doc_a"] < r["doc_b"] for r in rows)
    # wherever the corpus carries exact-duplicate texts, the identical
    # payloads must surface as hamming-0 pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_dup_docs = docs.count() - docs.select("text").distinct().count()
    if n_dup_docs > 0:
        assert any(r["hamming"] == 0 for r in rows)
