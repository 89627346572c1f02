"""text_bpe_tokenize correctness: independent pure-Python twin + invariants.

The Spark pipeline (operators/bpe.py) is rows-only (DuckDB has no
iterative-merge surface), so its correctness case rests here:

1. an INDEPENDENT reimplementation of fit + apply in plain Python over
   the same parquet bytes must reproduce the top-40 table exactly;
2. structural invariants: token-count conservation (sum of subword
   occurrences == sum of character-level word lengths is NOT expected —
   but every word's subwords must concatenate back to word + '</w>'),
   merge-table size bounds, and word_final flag consistency;
3. the registry-wide rerun-stability guard in test_determinism.py picks
   the query up automatically (rows-only class).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from sparkify_datalake_spark.operators.bpe import (
    N_MERGES,
    SAMPLE_MOD,
    VOCAB_CAP,
    WORD_END,
    fit_bpe_merges,
)


def _xxhash64_mod(spark, doc_ids, mod):
    """Compute Spark's xxhash64(doc_id) % mod slice membership.

    xxhash64 is a Spark-internal seed-42 variant with no cheap local
    twin, so the twin asks Spark for JUST the hash column (one tiny
    projection — everything downstream is pure Python).
    """
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": doc_ids})
    ).select(
        "doc_id",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(mod)).alias("m"),
    )
    return {r["doc_id"] for r in df.collect() if r["m"] == 0}


def _twin_encode(word: str, ranks: dict) -> tuple[str, ...]:
    """Greedy lowest-rank-first BPE encoding — independent of the
    mapInPandas kernel (written from the algorithm statement, not the
    kernel code)."""
    sym = list(word) + [WORD_END]
    while len(sym) > 1:
        candidates = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
            if (a, b) in ranks
        ]
        if not candidates:
            break
        rank, _ = min(candidates)
        a, b = next(p for p, r in ranks.items() if r == rank)
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return tuple(sym)


@pytest.fixture(scope="module")
def docs_pdf(sf_dir):
    import pyarrow.parquet as pq

    return (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
    )


def test_fit_merges_basic_properties():
    merges = fit_bpe_merges([("low", 5), ("lower", 2), ("lowest", 1)], 10)
    assert 0 < len(merges) <= 10
    assert len(set(merges)) == len(merges)
    # the most frequent pair in this toy corpus is ('l','o') with
    # weight 8; ('o','w') also has weight 8 — lexicographic tie-break
    # picks ('l','o') first.
    assert merges[0] == ("l", "o")


def test_fit_merges_deterministic():
    wf = [("banana", 3), ("bandana", 2), ("ban", 7)]
    assert fit_bpe_merges(wf, 25) == fit_bpe_merges(wf, 25)


def test_bpe_matches_pure_python_twin(spark, sf_dir, docs_pdf):
    from sparkify_datalake_spark.registry import queries

    spark_rows = sorted(
        (r["token"], r["n_occ"], r["n_docs"], r["word_final"])
        for r in queries()["text_bpe_tokenize"](spark, sf_dir).collect()
    )

    # --- independent twin --------------------------------------------
    in_slice = _xxhash64_mod(spark, list(docs_pdf["doc_id"]), SAMPLE_MOD)
    wf: Counter = Counter()
    for _, row in docs_pdf.iterrows():
        if row["doc_id"] in in_slice:
            for w in str(row["text"] or "").lower().split(" "):
                if w:
                    wf[w] += 1
    # top-VOCAB_CAP by (count desc, word asc) — mirror the orderBy+limit
    top = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_CAP]
    merges = fit_bpe_merges(top, N_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}

    occ: Counter = Counter()
    dfreq: Counter = Counter()
    enc_cache: dict[str, tuple[str, ...]] = {}
    for text in docs_pdf["text"].fillna(""):
        per_doc: Counter = Counter()
        for w in str(text).lower().split(" "):
            if w:
                if w not in enc_cache:
                    enc_cache[w] = _twin_encode(w, ranks)
                per_doc.update(enc_cache[w])
        for t, n in per_doc.items():
            occ[t] += n
            dfreq[t] += 1
    twin_top = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:40]
    twin_rows = sorted(
        (t, n, dfreq[t], t.endswith(WORD_END)) for t, n in twin_top
    )

    assert spark_rows == twin_rows


def test_encode_roundtrip_property(spark, sf_dir, docs_pdf):
    """Every word's subwords must concatenate back to word+'</w>'."""
    in_slice = _xxhash64_mod(spark, list(docs_pdf["doc_id"]), SAMPLE_MOD)
    wf: Counter = Counter()
    for _, row in docs_pdf.iterrows():
        if row["doc_id"] in in_slice:
            for w in str(row["text"] or "").lower().split(" "):
                if w:
                    wf[w] += 1
    top = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_CAP]
    ranks = {p: i for i, p in enumerate(fit_bpe_merges(top, N_MERGES))}
    for w in list(wf)[:500]:
        toks = _twin_encode(w, ranks)
        assert "".join(toks) == w + WORD_END, w
        # merged tokens are never empty and word_final only on the last
        assert all(toks), w
        assert all(not t.endswith(WORD_END) for t in toks[:-1]), w
