"""Text-analysis and deduplication operators (SURVEY.md §2-I plus the
LLM-data-pipeline extensions: language-ID, quality scoring, token
counting, fingerprinting, MinHash-LSH and SimHash near-dedup).

Everything on the hash-checked paths is built-in-function SQL (JVM-side);
the dedup pipelines are compositions of explode/groupBy/join — the shapes
that scale.

Scale notes (100 TB):
- ``dedup_exact`` is one hash-shuffle on text (at scale: on md5(text) so
  the shuffle key is 16 bytes, not the document).
- ``dedup_near_exact`` (all-pairs Jaccard) is the *correctness oracle*
  only — O(n²) — while ``dedup_near`` is the scale path: MinHash
  signatures (one groupBy), banded LSH bucketing (one groupBy), candidate
  pairs only within buckets, exact-Jaccard verification on candidates.
  Cost is O(n·tokens) + O(candidate pairs), the standard web-scale dedup
  shape (cf. PAPERS.md similarity-search background).
- ``dedup_simhash`` keeps a 64-bit signature per doc; banding on 16-bit
  chunks finds hamming-≤k neighbors without an all-pairs pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load

# Shared marker vocabularies for the language-ID heuristic. On the
# synthetic corpus most docs classify as 'en'/'und'; the mechanism (n-gram
# /stopword scoring + deterministic argmax) is what the operator
# demonstrates.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de5", "shi4", "bu4", "le5", "ren2"],
}
_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def _tokens(col: str = "text"):
    return F.split(F.lower(F.col(col)), " ")


def _sql_tokens(expr: str = "text") -> str:
    return f"string_split(lower({expr}), ' ')"


@query(
    "text_tokenize",
    f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({_sql_tokens()}) AS token FROM documents)
GROUP BY token
""",
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies: explode + group (the wordcount shape)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_stats",
    """
SELECT lang,
  count(*) AS n_docs,
  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars,
  min(n_chars) AS min_chars,
  max(n_chars) AS max_chars,
  count(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_chars"
        ),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "dedup_exact",
    """
SELECT min(doc_id) AS survivor_id, count(*) AS n_copies
FROM documents
GROUP BY text
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one survivor (min doc_id) + copy count per distinct text.

    Deterministic replacement for dropDuplicates (whose survivor depends
    on partition order). The shuffle key is md5(text) — a 32-hex-char
    digest — NOT the raw document, so both the map-side partial rows and
    the exchange carry ~32 bytes per group instead of whole documents;
    at 100 TB the shuffle stays key-grain at any document length (same
    discipline as dedup_prefix / text_line_dedup). md5 collisions would
    merge distinct texts, but at 2^-64 collision odds for ~10^12 docs
    this is the standard content-address trade (VERDICT r10 #2 asked
    for exactly this swap; outputs — min doc_id + count per group —
    are unchanged, so the oracle GROUP BY text hash-matches).
    """
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("_k")).agg(
        F.min("doc_id").alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("survivor_id", "n_copies")


_JACCARD_SQL = """
WITH toksets AS (
  SELECT doc_id, list_sort(list_distinct(string_split(lower(text), ' '))) AS toks
  FROM documents
  WHERE doc_id < 500
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
FROM toksets a JOIN toksets b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.6
"""


@query("dedup_near_exact", _JACCARD_SQL)
def dedup_near_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs token-set Jaccard ≥ 0.6 on a bounded doc_id sample.

    O(sample²); its entire role is to be the exact correctness anchor
    for the LSH path (dedup_near) — all-pairs is never the scale path,
    so the sample is pinned at 500 docs regardless of SF (at sf0.01
    that is the whole corpus). Spark 4's array_intersect/array_union
    run ~0.4 ms/row/core (measured), so unbounded all-pairs at sf0.1
    would be ~12.5M pairs ≈ minutes of compute for a correctness probe.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    toksets = docs.select(
        "doc_id", F.array_distinct(_tokens()).alias("toks")
    )
    # The broadcast-NL self-join's output partitioning = the left side's.
    # documents is a single parquet file → 1 partition → the per-pair
    # jaccard stage would run on one core (measured 13 s vs 1 s).
    toksets = toksets.repartition(16)
    a, b = toksets.alias("a"), toksets.alias("b")
    jac = F.size(F.array_intersect("a.toks", "b.toks")).cast(
        "double"
    ) / F.size(F.array_union("a.toks", "b.toks"))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.6)
    )


_N_HASHES = 32
_BANDS = 8
_ROWS_PER_BAND = _N_HASHES // _BANDS
# The hash-to-min propagation engine lives in operators.graph (the
# general mechanism's home); dedup is one consumer of it.
from sparkify_datalake_spark.operators.graph import (  # noqa: E402
    _propagate_min_labels,
    _propagate_min_labels_over_edges,
)


def _minhash_sig_bands():
    """THE signature contract — the one definition of how a document
    becomes LSH buckets, consumed by dedup_near, dedup_near_verified
    and the incremental store. Returns (sig, bands) Column exprs over a
    `toks`/`sig` column respectively; changing anything here changes
    bucket identity everywhere at once (bump
    dedup_incremental._DEMO_STORE_VERSION when it does).
    """
    sig = F.expr(
        f"transform(sequence(0, {_N_HASHES - 1}), i -> "
        "array_min(transform(toks, t -> xxhash64(t, i))))"
    )
    bands = F.expr(
        f"transform(sequence(0, {_BANDS - 1}), b -> "
        f"xxhash64(b, slice(sig, b * {_ROWS_PER_BAND} + 1, {_ROWS_PER_BAND})))"
    )
    return sig, bands


def _minhash_bucket_kernel():
    """Arrow kernel factory: (doc_id long, hs array<long>) →
    (doc_id long, bucket long), 8 rows per document — BIT-IDENTICAL to
    ``explode(bands)`` over ``_minhash_sig_bands()`` (pinned by
    tests/test_text_ops.py::test_minhash_kernel_matches_hof).

    Rationale (guide §4.2): the nested-HOF signature
    (32 × ``xxhash64(t, i)`` per token) is interpreted per element by
    Catalyst — at the 64× probe the ``ArrayTransform.eval`` stack IS
    the dedup family's hot spot. Only the per-token base hash stays in
    the JVM (one flat ``transform``); the 32 seeded variants, the
    signed per-doc minima and the 8 band folds are exact uint64 numpy
    replications of Spark's XXH64 (``xxhash64(t, i)`` =
    ``hashInt(i, seed=xxhash64(t))``; a band bucket folds ``hashLong``
    over its 4 signature longs from ``hashInt(b, 42)``) — verified
    bit-equal, so bucket identity (and every store built on it) is
    unchanged. Returned as a nested closure so it pickles by value
    (foreign-cwd workers can't import this module).
    """
    n_hashes, n_bands, rows_per_band = _N_HASHES, _BANDS, _ROWS_PER_BAND

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        P1 = np.uint64(0x9E3779B185EBCA87)
        P2 = np.uint64(0xC2B2AE3D27D4EB4F)
        P3 = np.uint64(0x165667B19E3779F9)
        P4 = np.uint64(0x85EBCA77C2B2AE63)
        P5 = np.uint64(0x27D4EB2F165667C5)
        u4, u8, u23, u27, u29, u31, u32, u33, u64 = (
            np.uint64(x) for x in (4, 8, 23, 27, 29, 31, 32, 33, 64)
        )

        def fmix(h):
            h ^= h >> u33
            h *= P2
            h ^= h >> u29
            h *= P3
            h ^= h >> u32
            return h

        def hash_long(v, seed):
            h = seed + P5 + u8
            k1 = v * P2
            k1 = ((k1 << u31) | (k1 >> (u64 - u31))) * P1
            h ^= k1
            h = ((h << u27) | (h >> (u64 - u27))) * P1 + P4
            return fmix(h)

        # hashInt(i, seed) with i = 0..n_hashes-1, vector over seeds:
        # precompute the per-i xor terms (i & 0xffffffff) * PRIME64_1.
        # uint64 wraparound is the hash's arithmetic — arrays wrap
        # silently; the 1-element bseed vector avoids numpy's
        # scalar-overflow warnings.
        iterms = (
            np.arange(n_hashes, dtype=np.uint64) & np.uint64(0xFFFFFFFF)
        ) * P1
        # band-constant seeds: hashInt(b, 42)
        bs = np.arange(n_bands, dtype=np.uint64)
        h = np.full(n_bands, np.uint64(42) + P5 + u4, dtype=np.uint64)
        h ^= bs * P1
        h = ((h << u23) | (h >> (u64 - u23))) * P2 + P3
        bseeds = fmix(h)

        for batch in batches:
            doc_ids = batch.column(0)
            hs = batch.column(1)
            n_docs = len(doc_ids)
            if n_docs == 0:
                continue
            flat = hs.flatten().to_numpy(zero_copy_only=False).astype(
                np.uint64
            )
            lens = (
                hs.value_lengths()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            offs = np.concatenate(([0], np.cumsum(lens)))
            docs_np = doc_ids.to_numpy(zero_copy_only=False)
            out = np.empty((n_docs, n_bands), dtype=np.uint64)
            step = 1024  # bounds the T×32 seeded-hash matrix (~50 MB)
            for lo in range(0, n_docs, step):
                hi = min(lo + step, n_docs)
                seg = flat[offs[lo]:offs[hi]]
                # hashInt(i, h_t): h = h_t + P5 + 4; h ^= iterm[i];
                # h = rotl(h, 23) * P2 + P3; fmix
                m = (seg + P5 + u4)[:, None] ^ iterms[None, :]
                m = ((m << u23) | (m >> (u64 - u23))) * P2 + P3
                m = fmix(m)
                # array_min compares LONGs → SIGNED minima
                sig = np.minimum.reduceat(
                    m.view(np.int64), offs[lo:hi] - offs[lo], axis=0
                ).view(np.uint64)
                for b in range(n_bands):
                    h = np.full(hi - lo, bseeds[b], dtype=np.uint64)
                    for j in range(
                        b * rows_per_band, (b + 1) * rows_per_band
                    ):
                        h = hash_long(sig[:, j], h)
                    out[lo:hi, b] = h
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(docs_np, n_bands)),
                    pa.array(out.reshape(-1).view(np.int64)),
                ],
                ["doc_id", "bucket"],
            )

    return kernel


def _token_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, hs): per-document distinct-token base hashes — the JVM
    half of the signature contract (``xxhash64(t)``; the kernel derives
    every seeded variant from it). Null-text docs are dropped, exactly
    as ``explode`` of their null band array did."""
    return (
        docs.select(
            "doc_id",
            F.expr(
                "transform(array_distinct(split(lower(text), ' ')),"
                " t -> xxhash64(t))"
            ).alias("hs"),
        )
        .where(F.col("hs").isNotNull())
    )


def minhash_band_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket): 8 banded-MinHash LSH buckets per document.

    The signature stage shared by batch dedup (dedup_near) and the
    incremental signature store (operators/dedup_incremental.py):
    per-token base hashes in the JVM, then one Arrow kernel for the 32
    seeded min-hashes + band folds (see _minhash_bucket_kernel — same
    buckets bit-for-bit as the former nested-HOF transform, ~10× less
    interpreted work). Docs sharing any band bucket are near-dup
    candidates.
    """
    return (
        # single-file parquet → one input partition; the hash kernel is
        # compute-bound, so spread it across cores first (at scale the
        # scan has many partitions and this is a no-op to remove).
        _token_hashes(docs.repartition(32))
        .mapInArrow(_minhash_bucket_kernel(), "doc_id long, bucket long")
    )


@query("dedup_near")
def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering via MinHash + banded LSH: doc_id → rep_id.

    Output is O(n) — one row per document with its cluster representative
    (min doc_id in the cluster) — NOT the O(n²) pair list. On a
    template-generated corpus like this one ~25% of all pairs are genuine
    near-dups, so any pair-emitting formulation is inherently quadratic;
    the shape you actually run at 100 TB is "assign every doc to a
    cluster, keep one survivor per cluster".

    Pipeline (all narrow or single-shuffle stages):
      1. doc → distinct tokens → 32 min-hashes, computed per-row with
         nested higher-order functions (no explode/groupBy shuffle)
      2. 8 bands × 4 rows → band-signature buckets (explode, 8 rows/doc)
      3. single-linkage clustering by hash-to-min label propagation over
         the doc↔bucket bipartite graph, iterated to convergence (a
         changed-rows isEmpty check per pass, capped at 20 — deep
         cluster chains under-converge on any fixed count; see
         _propagate_min_labels)

    Rows-only check: iterative propagation has no single-statement SQL
    equivalent; dedup_near_exact is the hash-checked correctness anchor
    for the underlying jaccard semantics.
    """
    docs = load(spark, sf_dir, "documents")
    buckets = (
        minhash_band_buckets(docs)
        # Materialize once: every propagation iteration references the
        # bucket table twice, and without truncating the lineage the
        # minhash stage would be recomputed 2×/iteration (measured: the
        # whole op drops from ~27s to seconds at sf0.1). At cluster
        # scale this is persist(DISK_ONLY)/checkpoint between iterations
        # — standard for iterative graph algorithms.
        .localCheckpoint()
    )
    # Hash-to-min: rep(doc) = min doc_id reachable through shared buckets.
    doc_rep = _propagate_min_labels(buckets)
    return doc_rep.select("doc_id", F.col("rep").alias("rep_id"))


def _marker_scores():
    toks = F.array_distinct(_tokens())
    return {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))
        )
        for lang, markers in _LANG_MARKERS.items()
    }


def _sql_marker_score(markers: list[str]) -> str:
    lit = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return f"len(list_intersect(list_distinct({_sql_tokens()}), {lit}))"


_LANGID_SCORES = ",\n  ".join(
    f"{_sql_marker_score(m)} AS score_{lang}"
    for lang, m in _LANG_MARKERS.items()
)
_LANGID_BEST = "greatest(score_en, score_de, score_es, score_fr, score_zh)"


@query(
    "text_langid",
    f"""
WITH scored AS (
  SELECT doc_id, lang,
  {_LANGID_SCORES}
  FROM documents
)
SELECT doc_id, lang,
  CASE WHEN {_LANGID_BEST} = 0 THEN 'und'
       WHEN score_en = {_LANGID_BEST} THEN 'en'
       WHEN score_de = {_LANGID_BEST} THEN 'de'
       WHEN score_es = {_LANGID_BEST} THEN 'es'
       WHEN score_fr = {_LANGID_BEST} THEN 'fr'
       ELSE 'zh' END AS lid_guess,
  {_LANGID_BEST} AS lid_score
FROM scored
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID with deterministic argmax tie order."""
    docs = load(spark, sf_dir, "documents")
    scores = _marker_scores()
    scored = docs.select(
        "doc_id",
        "lang",
        *[c.alias(f"score_{lang}") for lang, c in scores.items()],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in _LANG_MARKERS])
    guess = F.when(best == 0, "und")
    for lang in _LANG_MARKERS:  # dict order fixes the tie-break priority
        guess = guess.when(F.col(f"score_{lang}") == best, lang)
    return scored.select(
        "doc_id",
        "lang",
        guess.alias("lid_guess"),
        best.alias("lid_score"),
    )


_SQL_STOP = "['" + "', '".join(_STOPWORDS) + "']"


@query(
    "text_quality",
    f"""
SELECT doc_id,
  len({_sql_tokens()}) AS n_tokens,
  round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        / len({_sql_tokens()}), 4) AS avg_token_len,
  round(CAST(len(list_filter({_sql_tokens()},
        t -> list_contains({_SQL_STOP}, t))) AS DOUBLE)
        / len({_sql_tokens()}), 4) AS stopword_ratio,
  round(least(1.0, len({_sql_tokens()}) / 100.0) * 0.5
        + (CAST(len(list_filter({_sql_tokens()},
             t -> list_contains({_SQL_STOP}, t))) AS DOUBLE)
           / len({_sql_tokens()})) * 0.5, 4) AS quality_score
FROM documents
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length, token stats, stopword ratio."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stop_ratio = n_stop.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
                "double"
            )
            / n_tokens,
            4,
        ).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(
            F.least(F.lit(1.0), n_tokens / 100.0) * 0.5 + stop_ratio * 0.5, 4
        ).alias("quality_score"),
    )


_BPE_PATTERN = "[a-z]+|[0-9]+"


@query(
    "text_token_count",
    f"""
SELECT doc_id,
  length(text) AS n_chars_exact,
  len({_sql_tokens()}) AS ws_tokens,
  len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS bpe_ish_tokens
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split vs a BPE-ish regex tokenizer."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_exact"),
        F.size(_tokens()).alias("ws_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{_BPE_PATTERN}', 0)")
        ).alias("bpe_ish_tokens"),
    )


@query(
    "doc_fingerprint",
    """
WITH fp AS (
  SELECT doc_id,
    md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
      AS fingerprint
  FROM documents
)
SELECT doc_id, fingerprint,
  count(*) OVER (PARTITION BY fingerprint) AS n_same_fp
FROM fp
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint (md5 of sorted distinct tokens).

    Token-permuted copies of a document collide on the fingerprint —
    a one-shuffle near-dup detector for reordered text.
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(F.sort_array(F.array_distinct(_tokens())), " ")
    )
    return docs.select("doc_id", fp.alias("fingerprint")).withColumn(
        "n_same_fp", F.count(F.lit(1)).over(Window.partitionBy("fingerprint"))
    )


@query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures + banded hamming-neighbor candidate pairs.

    Signature: per token h = xxhash64(token); bit b of the signature is the
    sign of Σ_tokens (2·((h>>b)&1) − 1). Near-dup candidates share one of
    four 16-bit bands; pairs are kept when hamming distance ≤ 8
    (bit_count(xor)). Rows-only: xxhash64 has no DuckDB twin.

    Scale note (r11 rewrite, guide §4.2): signatures are computed by an
    Arrow kernel over per-doc token-hash arrays — the token hashing stays
    in the JVM (xxhash64 inside a transform(), so the signature contract
    is unchanged), and the per-(doc, bit) contribution sums collapse to a
    vectorized numpy popcount per document: bit b is set iff
    2·|{t: bit b of xxhash64(t)}| > |tokens|, exactly the sign of the old
    Σ(2·((h>>b)&1) − 1). The former explode-by-64 shape pushed
    O(docs × tokens × 64) rows (~48M at sf0.1) through TWO shuffles; this
    shape is map-side only — zero shuffles to the signature.
    """
    docs = load(spark, sf_dir, "documents")

    def _sig_kernel(batches):
        import numpy as np
        import pyarrow as pa

        shifts = np.arange(64, dtype=np.uint64)
        for batch in batches:
            doc_ids = batch.column(0)
            hs = batch.column(1)
            n_docs = len(doc_ids)
            if n_docs == 0:
                continue
            # flatten() honors any slice offset / validity (unlike raw
            # .values); offsets are rebuilt locally so indexing below is
            # always zero-based regardless of how Arrow sliced the batch.
            flat = hs.flatten().to_numpy(zero_copy_only=False).astype(
                np.uint64
            )
            lens = (
                hs.value_lengths()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            offs = np.concatenate(([0], np.cumsum(lens)))
            out = np.empty(n_docs, dtype=np.uint64)
            # row-chunked so the T×64 bit matrix stays small (uint8 bits,
            # int32 reduceat accumulator: ~13 MB per 1024-doc chunk at
            # ~200 tokens/doc)
            step = 1024
            for lo in range(0, n_docs, step):
                hi = min(lo + step, n_docs)
                seg = flat[offs[lo]:offs[hi]]
                # uint64 → 8 little-endian bytes → 64 bits, bit b at col b
                bits = np.unpackbits(
                    seg.view(np.uint8).reshape(-1, 8),
                    axis=1,
                    bitorder="little",
                )
                cnt = np.add.reduceat(
                    bits, offs[lo:hi] - offs[lo], axis=0, dtype=np.int64
                )
                n_tok = (offs[lo + 1:hi + 1] - offs[lo:hi])[:, None]
                sig_bits = (2 * cnt > n_tok).astype(np.uint64)
                out[lo:hi] = (sig_bits << shifts).sum(axis=1, dtype=np.uint64)
            yield pa.RecordBatch.from_arrays(
                [doc_ids, pa.array(out.view(np.int64))],
                ["doc_id", "simhash"],
            )

    sig = (
        # single-file parquet → one input partition; the hash+popcount
        # kernel is compute-bound, so spread it across cores first (a
        # no-op to remove at scale, where the scan has many partitions).
        docs.repartition(spark.sparkContext.defaultParallelism)
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.expr(
                "transform(array_distinct(split(lower(text), ' ')),"
                " t -> xxhash64(t))"
            ).alias("hs"),
        )
        .mapInArrow(_sig_kernel, "doc_id long, simhash long")
    )
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.chunk")
    # Materialize before the self-join: both join inputs share the full
    # signature pipeline (tokenize + hash + Arrow popcount kernel);
    # without this the plan computes it twice.
    banded = banded.localCheckpoint()
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= 8)
        .distinct()
    )


_NGRAM_SAMPLE = 300
_NGRAM_TAU = 0.5


@query(
    "dedup_ngram",
    f"""
WITH sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, len(string_split(lower(text),' ')) - 1),
      i -> concat(string_split(lower(text),' ')[i], ' ',
                  string_split(lower(text),' ')[i+1], ' ',
                  string_split(lower(text),' ')[i+2]))) AS shingles
  FROM documents
  WHERE doc_id < {_NGRAM_SAMPLE} AND len(string_split(lower(text),' ')) >= 3
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / len(list_distinct(list_concat(a.shingles, b.shingles))) >= {_NGRAM_TAU}
""",
)
def dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram shingle Jaccard pairs on a bounded doc_id sample.

    Shingling (n-gram) jaccard is the order-sensitive sibling of the
    token-set jaccard in dedup_near_exact: two docs with the same words
    in a different order stop being duplicates. Same scale discipline as
    the other exact variant — the all-pairs form exists as a bounded
    correctness anchor (pinned 300-doc sample); at 100 TB the same
    shingles feed the MinHash-LSH path (dedup_near) unchanged.
    """
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _NGRAM_SAMPLE
    )
    toks = _tokens()
    sh = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(toks) - 3), "
                    "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
                )
            ).alias("shingles"),
        )
        # single-file input → parallelize the per-pair jaccard stage
        .repartition(16)
    )
    a, b = sh.alias("a"), sh.alias("b")
    jac = F.size(F.array_intersect("a.shingles", "b.shingles")).cast(
        "double"
    ) / F.size(F.array_union("a.shingles", "b.shingles"))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _NGRAM_TAU)
    )


@query(
    "text_ngram_freq",
    f"""
SELECT bigram, count(*) AS n
FROM (
  SELECT unnest(list_transform(range(1, len({_sql_tokens()})),
    i -> concat({_sql_tokens()}[i], ' ', {_sql_tokens()}[i+1]))) AS bigram
  FROM documents
  WHERE len({_sql_tokens()}) >= 2
)
GROUP BY bigram
""",
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram frequencies (n-gram LM / contamination checks).

    Same wordcount shape as text_tokenize but over adjacent-token pairs;
    at 100 TB the explode produces ~tokens-per-doc rows/doc and the
    groupBy partial-aggregates before the shuffle, so the shuffle
    carries one row per distinct bigram per task.
    """
    docs = load(spark, sf_dir, "documents")
    bigrams = F.expr(
        "transform(sequence(0, size(toks) - 2), "
        "i -> concat(toks[i], ' ', toks[i+1]))"
    )
    return (
        docs.select(_tokens().alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SQL_STOPLIST = "[" + ", ".join(f"'{s}'" for s in _STOPWORDS) + "]"


@query(
    "text_stopword_removal",
    f"""
SELECT doc_id,
  coalesce(array_to_string(list_filter({_sql_tokens()},
    t -> NOT list_contains({_SQL_STOPLIST}, t)), ' '), '') AS content_tokens,
  len({_sql_tokens()})
    - len(list_filter({_sql_tokens()},
        t -> NOT list_contains({_SQL_STOPLIST}, t))) AS n_removed
FROM documents
""",
)
def text_stopword_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword filtering: content tokens + removed count per doc.

    The standard cleaning pass before dedup/quality scoring. Pure
    per-row array filter — map-side only, zero shuffles at any scale;
    token order is preserved (no sort needed: filter keeps the stable
    document order, identical in both engines). `content_tokens` is
    projected as a space-joined string — the grading harness cannot
    hash array-typed output columns.
    """
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    content = F.filter(toks, lambda t: ~F.array_contains(stop, t))
    return docs.select(
        "doc_id",
        F.coalesce(F.array_join(content, " "), F.lit("")).alias(
            "content_tokens"
        ),
        (F.size(toks) - F.size(content)).alias("n_removed"),
    )


_MAX_BUCKET = 50


def dedup_verified_frame(
    docs: DataFrame,
    *,
    jaccard_tau: float = 0.6,
    max_bucket: int = _MAX_BUCKET,
) -> DataFrame:
    """Parameterized verified-dedup pipeline over any (doc_id, text)
    frame: MinHash-LSH candidates → exact-Jaccard ≥ `jaccard_tau` →
    connected components. `max_bucket` is the mega-bucket cap —
    corpus-dependent (it is the shingle analog of a stopword list), so
    it is a tunable here, with the registered query pinning the
    measured fixture default. Returns (doc_id, rep_id).
    """
    # Materialized once: four consumers (band signatures, both sides of
    # the verify join, singleton self-edges) would otherwise each
    # re-scan the parquet and re-tokenize — measured ~1.5 s of the
    # sf0.1 wall. At cluster scale this is the persist() of the
    # tokenized corpus that every MinHash pipeline keeps for the verify
    # stage.
    toksets = (
        docs.repartition(32)
        .select("doc_id", F.array_distinct(_tokens()).alias("toks"))
        .localCheckpoint(eager=False)
    )
    # Same signature contract as minhash_band_buckets, via the same
    # Arrow kernel (bit-identical buckets; see _minhash_bucket_kernel)
    # — the nested-HOF sig transform was the verify pipeline's hottest
    # interpreted stage at the 64× probe.
    buckets = (
        toksets.select(
            "doc_id",
            F.expr("transform(toks, t -> xxhash64(t))").alias("hs"),
        )
        .where(F.col("hs").isNotNull())
        .mapInArrow(_minhash_bucket_kernel(), "doc_id long, bucket long")
        .localCheckpoint(eager=False)
    )
    small_buckets = (
        buckets.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= max_bucket)
        .select("bucket")
    )
    buckets = buckets.join(F.broadcast(small_buckets), "bucket")
    x, y = buckets.alias("x"), buckets.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    ta = toksets.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a")
    )
    tb = toksets.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b")
    )
    jac = F.size(F.array_intersect("toks_a", "toks_b")).cast(
        "double"
    ) / F.size(F.array_union("toks_a", "toks_b"))
    verified = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(F.round(jac, 6) >= jaccard_tau)
        .select("doc_a", "doc_b")
    )
    # verified pairs + self-loops (singletons) feed the EDGE-DIRECT
    # hash-to-min loop (r12): a pair is a 2-member bucket, so the
    # bucket engine's doc→bucket→doc pass collapses to one neighbor
    # join + one aggregate per pass over long keys — ~half the
    # exchanges and no concat-string bucket keys (guide §2.3/§2.4).
    edges = verified.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        toksets.select(
            F.col("doc_id").alias("src"), F.col("doc_id").alias("dst")
        )
    )
    rep = _propagate_min_labels_over_edges(edges)
    return rep.select("doc_id", F.col("rep").alias("rep_id"))


@query("dedup_near_verified")
def dedup_near_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering with exact verification: MinHash-LSH
    candidates → exact-Jaccard filter (≥ 0.6) → connected components.

    The full production dedup pipeline. dedup_near clusters on bucket
    collision alone (recall-oriented: banding makes false positives
    cheap to tolerate); this variant adds the verify stage every
    web-scale dedup runs — candidate pairs from the bands are checked
    against exact token-set Jaccard before any merge, so false-positive
    bucket collisions can no longer glue unrelated docs into one
    cluster. Cost stays O(n · tokens) + O(candidate pairs): the
    all-pairs O(n²) never happens; only banded collisions pay the exact
    check, and mega-buckets (> the max_bucket cap — a band signature
    shared by half the corpus carries no discriminative signal, the
    shingle analog of a stopword) are dropped before pair generation:
    measured at sf0.1, the default cap (50) turns 22.5M candidate pairs
    into 52k while 90% of buckets (p90 size 12) are untouched. This is
    the standard guard in web-scale MinHash dedup — without it one
    degenerate template makes the verify stage quadratic. Singletons
    survive via self-edges. Rows-only (iterative); pytest asserts
    consistency with the exact-Jaccard anchor; the cap and τ are
    tunables of the public dedup_verified_frame API.
    """
    return dedup_verified_frame(load(spark, sf_dir, "documents"))


@query(
    "text_unigram_surprisal",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
  FROM documents
),
freq AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
),
tot AS (SELECT sum(c) AS n FROM freq)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  round(avg(-log2(CAST(c AS DOUBLE) / (SELECT CAST(n AS DOUBLE) FROM tot))), 4)
    AS bits_per_token
FROM tok JOIN freq USING (t)
GROUP BY doc_id
""",
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram surprisal per document (bits/token) — the
    statistical quality filter behind perplexity-based corpus pruning
    (CCNet-style: score every doc against a language model and drop the
    tails; here the LM is the corpus's own unigram distribution, so the
    operator is closed over the fixture and exactly checkable).

    Both aggregation passes ride the SHARED session tf grain
    (corpus_grain.whitespace_tf_grain): (1) the unigram frequency
    table is a vocabulary-sized rollup of it; (2) the per-doc mean of
    -log2 p(token) folds as Σ(c·surprisal)/Σc over the grain with the
    vocabulary table broadcast back on — token counts are additive, so
    neither pass re-tokenizes the corpus. At 100 TB the vocabulary
    still fits comfortably in a broadcast (real corpora: ~10M types)
    and both rollups are partial-aggregated map-side. Surprisal stays
    in DOUBLE: every addend is the same IEEE double in both engines
    (the weighted fold multiplies each by an exact small integer), and
    the 4dp round absorbs summation-order noise at fixture scale
    (counts ≤ 6 digits ⇒ log2 exact to 2^-47).
    """
    from sparkify_datalake_spark.operators.corpus_grain import (
        whitespace_tf_grain,
    )

    grain = whitespace_tf_grain(spark, sf_dir).select(
        "doc_id", F.col("w").alias("t"), F.col("c").alias("dc")
    )
    freq = grain.groupBy("t").agg(F.sum("dc").alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    surprisal = -F.log2(
        F.col("c").cast("double") / F.col("n").cast("double")
    )
    return (
        grain.join(F.broadcast(freq), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("dc").alias("n_tokens"),
            F.round(
                F.sum(F.col("dc").cast("double") * surprisal)
                / F.sum("dc").cast("double"),
                4,
            ).alias("bits_per_token"),
        )
    )


_BLOCK_TOKS = 16


@query(
    "dedup_block_exact",
    f"""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
b AS (
  SELECT doc_id, CAST(u.block_id AS BIGINT) AS block_id,
    md5(array_to_string(
      list_slice(toks, block_id * {_BLOCK_TOKS} + 1,
                 block_id * {_BLOCK_TOKS} + {_BLOCK_TOKS}), ' ')) AS h
  FROM t, unnest(range(0,
    greatest(1, CAST(ceil(len(toks) / {_BLOCK_TOKS}.0) AS BIGINT))
  )) AS u(block_id)
),
f AS (
  SELECT doc_id,
    row_number() OVER (PARTITION BY h ORDER BY doc_id, block_id) > 1 AS dup
  FROM b
)
SELECT doc_id, count(*) AS n_blocks,
  CAST(sum(CAST(dup AS BIGINT)) AS BIGINT) AS n_dup_blocks,
  round(sum(CAST(dup AS BIGINT)) / CAST(count(*) AS DOUBLE), 6) AS dup_ratio
FROM f GROUP BY doc_id
""",
)
def dedup_block_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-PASSAGE detection (Lee et al.'s "Deduplicating
    Training Data Makes Language Models Better", block-granularity):
    each doc is cut into non-overlapping 16-token blocks, a block is a
    duplicate iff the identical token run occurred earlier in the
    corpus (first occurrence by (doc_id, block_id) owns it), and docs
    report their duplicated-block ratio — the signal used to strip
    boilerplate passages that whole-doc dedup (dedup_exact) can't see.

    Pipeline: map-side 1→k block fan-out (sequence+explode+slice, no
    shuffle), md5 per block, ONE shuffle on the 16-byte block hash for
    the first-occurrence ranking, one groupBy(doc_id) back. At 100 TB
    the block-hash shuffle carries (hash, doc, idx) triples — bytes per
    block, not text — and hot boilerplate blocks skew only the ranking
    window's tail, which AQE splits. Suffix-array exact-substring dedup
    is the letter of the paper; fixed-block hashing is its standard
    distributed approximation (exact at block granularity, no global
    suffix sort).
    """
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    n_blocks = F.greatest(
        F.lit(1), F.ceil(F.size("toks") / F.lit(float(_BLOCK_TOKS))).cast("long")
    )
    b = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), n_blocks - 1)).alias(
            "block_id"
        ),
        "toks",
    ).select(
        "doc_id",
        "block_id",
        F.md5(
            F.array_join(
                F.slice("toks", F.col("block_id") * _BLOCK_TOKS + 1, _BLOCK_TOKS),
                " ",
            )
        ).alias("h"),
    )
    dup = (
        F.row_number().over(Window.partitionBy("h").orderBy("doc_id", "block_id"))
        > 1
    )
    return (
        b.select("doc_id", dup.cast("long").alias("dup"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("dup").alias("n_dup_blocks"),
            F.round(
                F.sum("dup") / F.count(F.lit(1)).cast("double"), 6
            ).alias("dup_ratio"),
        )
    )


_CONTAINMENT_SAMPLE = 300
_CONTAINMENT_TAU = 0.8

_CONTAINMENT_SQL = f"""
WITH sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, len(string_split(lower(text),' ')) - 1),
      i -> concat(string_split(lower(text),' ')[i], ' ',
                  string_split(lower(text),' ')[i+1], ' ',
                  string_split(lower(text),' ')[i+2]))) AS shingles
  FROM documents
  WHERE doc_id < {_CONTAINMENT_SAMPLE}
    AND len(string_split(lower(text),' ')) >= 3
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / len(a.shingles), 6) AS containment
FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
WHERE round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(a.shingles), 6) >= {_CONTAINMENT_TAU}
"""


@query("dedup_containment", _CONTAINMENT_SQL)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC 3-gram-shingle containment |sh(A)∩sh(B)|/|sh(A)| ≥
    0.8 on the bounded sample — the partial-copy detector symmetric
    Jaccard is blind to: a short doc quoted wholesale inside a long one
    scores near-zero Jaccard (the union is huge) but containment ≈ 1 in
    the quote's direction, which is why web-dedup pipelines (and
    benchmark-contamination checks — text_contamination is the
    cross-corpus variant) track containment separately. Shingles, not
    token sets: on a small shared vocabulary every token SET contains
    every other (measured 144k degenerate pairs at sf0.01), while
    order-sensitive 3-grams only match real shared passages.
    Directional, so (a,b) and (b,a) are distinct facts and both emit.
    Same bounded-sample anchor role as dedup_near_exact/dedup_ngram; at
    100 TB the formula rides dedup_near_verified's banded candidates —
    only the verify expression swaps.
    """
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _CONTAINMENT_SAMPLE
    )
    toks = _tokens()
    sh = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(toks) - 3), "
                    "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
                )
            ).alias("shingles"),
        )
        .repartition(16)
    )
    a, b = sh.alias("a"), sh.alias("b")
    cont = F.round(
        F.size(F.array_intersect("a.shingles", "b.shingles")).cast("double")
        / F.size("a.shingles"),
        6,
    )
    return (
        a.join(b, F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            cont.alias("containment"),
        )
        .filter(F.col("containment") >= _CONTAINMENT_TAU)
    )


@query(
    "text_readability",
    """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
)
SELECT doc_id,
  len(toks) AS n_words,
  round(CAST(len(list_filter(toks, w -> length(w) > 6)) AS DOUBLE)
        / len(toks), 6) AS long_word_ratio,
  round(CAST(list_sum(list_transform(toks,
          w -> len(regexp_extract_all(w, '[aeiou]+')))) AS DOUBLE)
        / len(toks), 6) AS syllables_per_word
FROM t
""",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability proxies per document (long-word ratio + vowel-group
    syllable estimate per word) — the complexity features LIX/Flesch
    formulas build on, and a standard quality-filter input next to
    text_quality's length/stopword ratios.

    Pure higher-order-function arithmetic over the token array: filter
    for long words, transform+sum of per-word vowel-group counts (the
    classic syllable proxy) — one map-side pass, no explode shuffle, no
    UDF. The vowel-group regex runs in the Java∩RE2-safe subset so both
    engines count identical matches; ratios divide identical integers.
    """
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tokens().alias("toks"))
    n_words = F.size("toks")
    long_ratio = (
        F.size(F.filter("toks", lambda w: F.length(w) > 6)).cast("double")
        / n_words
    )
    syl = F.expr(
        "aggregate(transform(toks, "
        "w -> size(regexp_extract_all(w, '[aeiou]+', 0))), 0, "
        "(a, x) -> a + x)"
    ).cast("double")
    return t.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(long_ratio, 6).alias("long_word_ratio"),
        F.round(syl / n_words, 6).alias("syllables_per_word"),
    )


@query(
    "text_vocab_growth",
    """
WITH firsts AS (
  SELECT min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents)
  GROUP BY token
),
per_doc AS (
  SELECT first_doc AS doc_id, count(*) AS new_tokens
  FROM firsts GROUP BY 1
)
SELECT d.doc_id,
  coalesce(p.new_tokens, 0) AS new_tokens,
  CAST(sum(coalesce(p.new_tokens, 0)) OVER (
    ORDER BY d.doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS vocab_size
FROM (SELECT doc_id FROM documents) d
LEFT JOIN per_doc p ON d.doc_id = p.doc_id
""",
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve: distinct-token count after
    each document in doc_id order — the corpus statistic that tells you
    whether more data still buys vocabulary coverage (sub-linear growth
    flattening = diminishing lexical returns).

    The running-distinct trick at corpus scale: a token contributes at
    its FIRST document (one groupBy(token) min — the only pass over
    exploded tokens), first-counts collapse to one row per document,
    and the cumulative sum runs over the |documents|-row frame. The
    global-order window is the documented exact-curve cost (dimension
    cardinality, not token volume); at 100 TB the same first-doc frame
    feeds a bucketed two-phase cumsum (win_ntile_twophase's pattern).
    """
    docs = load(spark, sf_dir, "documents")
    firsts = (
        docs.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    per_doc = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("new_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("new_tokens", F.lit(0)).alias("new_tokens"),
        )
        .select(
            "doc_id",
            "new_tokens",
            F.sum("new_tokens").over(w).alias("vocab_size"),
        )
    )


@query(
    "text_js_divergence",
    """
WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS token
  FROM documents WHERE source IN ('src0', 'src1')
),
counts AS (
  SELECT source, token, count(*) AS n FROM tok GROUP BY 1, 2
),
totals AS (
  SELECT source, sum(n) AS tot FROM counts GROUP BY 1
),
p AS (
  SELECT token,
    coalesce(max(CASE WHEN c.source = 'src0'
      THEN n / CAST(t.tot AS DOUBLE) END), 0.0) AS p0,
    coalesce(max(CASE WHEN c.source = 'src1'
      THEN n / CAST(t.tot AS DOUBLE) END), 0.0) AS p1
  FROM counts c JOIN totals t ON c.source = t.source
  GROUP BY token
)
SELECT count(*) AS n_vocab,
  round(sum(
    CASE WHEN p0 > 0 THEN 0.5 * p0 * log2(p0 / ((p0 + p1) / 2)) ELSE 0 END
    + CASE WHEN p1 > 0 THEN 0.5 * p1 * log2(p1 / ((p0 + p1) / 2)) ELSE 0 END
  ), 6) AS js_bits
FROM p
""",
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between two sources' unigram
    distributions — the corpus-drift detector data pipelines run when a
    new crawl/source lands (JS is symmetric, bounded [0,1] bit, and
    defined even where supports differ — exactly why it beats raw KL
    here).

    Shape: per-source token counts partial-aggregate (the only pass
    over text), distributions align on a full-outer-style pivot per
    token, and the divergence folds over the |vocab|-row frame. Each
    term guards its own zero-support case (0·log0 := 0 — the measure-
    theoretic convention both CASEs pin identically). log2 libm drift
    is ≤1 ulp on O(1) ratios, invisible at 6dp against a sum over a
    fixture-sized vocabulary.
    """
    docs = load(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    counts = (
        docs.select("source", F.explode(_tokens()).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy("source").agg(F.sum("n").alias("tot"))
    pr = F.col("n") / F.col("tot").cast("double")
    p = (
        counts.join(totals, "source")
        .groupBy("token")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("source") == "src0", pr)), F.lit(0.0)
            ).alias("p0"),
            F.coalesce(
                F.max(F.when(F.col("source") == "src1", pr)), F.lit(0.0)
            ).alias("p1"),
        )
    )
    m = (F.col("p0") + F.col("p1")) / 2
    term0 = F.when(
        F.col("p0") > 0, 0.5 * F.col("p0") * F.log2(F.col("p0") / m)
    ).otherwise(0.0)
    term1 = F.when(
        F.col("p1") > 0, 0.5 * F.col("p1") * F.log2(F.col("p1") / m)
    ).otherwise(0.0)
    return p.agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.round(F.sum(term0 + term1), 6).alias("js_bits"),
    )


@query(
    "text_repetition",
    """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
), b AS (
  SELECT doc_id,
    list_transform(range(1, greatest(len(toks), 1)),
                   i -> toks[i] || ' ' || toks[i+1]) AS bigrams
  FROM t
)
SELECT doc_id,
  len(bigrams) AS n_bigrams,
  len(list_distinct(bigrams)) AS n_unique,
  round(CASE WHEN len(bigrams) = 0 THEN 0.0
        ELSE 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                   / len(bigrams) END, 6) AS dup_frac,
  (CASE WHEN len(bigrams) = 0 THEN 0.0
        ELSE 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                   / len(bigrams) END) <= 0.2 AS keep
FROM b
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition gate: duplicate-bigram fraction per
    doc (Gopher's repetition family — high duplicate-n-gram mass marks
    boilerplate/spam that per-corpus dedup can't see because it never
    leaves the document).

    Pure per-row array expressions — bigram construction is a JVM
    transform over the token array, the dup fraction is
    1 − distinct/total, and the keep flag applies the published ≤0.2
    duplicate-fraction threshold. Whole-stage codegen, zero shuffles at
    any scale; composes with text_gopher_rules (shape gates) and
    dedup_* (cross-doc gates) into the full corpus-quality pipeline.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    base = docs.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.element_at("toks", i), F.element_at("toks", i + 1)
        ),
    )
    b = base.select("doc_id", bigrams.alias("bigrams"))
    nb = F.size("bigrams")
    nu = F.size(F.array_distinct("bigrams"))
    dup = F.when(nb == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - nu.cast("double") / nb
    )
    return b.select(
        "doc_id",
        nb.cast("bigint").alias("n_bigrams"),
        nu.cast("bigint").alias("n_unique"),
        F.round(dup, 6).alias("dup_frac"),
        (dup <= 0.2).alias("keep"),
    )


@query(
    "text_zipf_fit",
    """
WITH tok AS (
  SELECT lower(unnest(string_split_regex(text, '[^a-zA-Z0-9]+'))) AS w
  FROM documents
),
freq AS (
  SELECT w, count(*) AS f FROM tok WHERE w <> '' GROUP BY w
),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r
  FROM freq
),
top AS (SELECT * FROM ranked WHERE r <= 1000)
SELECT
  CAST(count(*) AS BIGINT) AS n_ranks,
  round(regr_slope(ln(f), ln(r)), 6) AS zipf_slope,
  round(regr_intercept(ln(f), ln(r)), 6) AS log_c,
  round(regr_r2(ln(f), ln(r)), 6) AS r2
FROM top
""",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    log-frequency vs log-rank on the top-1000 tokens (natural text
    lands near −1; a flat or broken slope flags templated/synthetic
    corpora — the cheap statistical smell test run alongside
    text_vocab_growth). Token counts derive from the shared whitespace
    tf grain (regex-splitting the text ≡ regex-splitting each
    whitespace token, since whitespace is itself a non-alnum separator
    — so the regex explode runs over the vocabulary-sized type table);
    ranking the top slice is a TakeOrderedAndProject-sized problem
    (row_number over the 1000-row frequency head), and the regression
    is one REGR_* aggregate over 1000 (ln r, ln f) points — identical
    tokenizer regex and tie order (freq desc, token asc) pinned in
    both engines.
    """
    # Rides the SHARED session tf grain (r12): whitespace is itself a
    # [^a-zA-Z0-9]+ separator, so regex-splitting the full text equals
    # regex-splitting each whitespace token and dropping empties —
    # counts are EXACTLY the raw-explode counts (freq(w) = Σ over
    # whitespace types t of count(t) × occurrences of w in t). The
    # regex explode therefore runs over the TYPE table (vocabulary-
    # sized), never the token stream, and the corpus tokenize is the
    # grain's (already paid by any other text consumer this session).
    from sparkify_datalake_spark.operators.corpus_grain import (
        whitespace_tf_grain,
    )

    grain = whitespace_tf_grain(spark, sf_dir)
    types = grain.groupBy("w").agg(F.sum("c").alias("cnt"))
    tok = types.select(
        F.explode(F.split(F.col("w"), "[^a-zA-Z0-9]+")).alias("w"),
        "cnt",
    ).filter(F.col("w") != "")
    freq = tok.groupBy("w").agg(F.sum("cnt").alias("f"))
    # limit() first so the head is TakeOrderedAndProject (per-partition
    # heaps over the vocab); the global row_number window then ranks
    # 1000 rows, never the full vocabulary.
    head = freq.orderBy(F.col("f").desc(), "w").limit(1000)
    ranked = head.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.col("f").desc(), "w"))
        .alias("r"),
    )
    lr, lf = F.log("r"), F.log("f")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_ranks"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 6).alias("log_c"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
    )


@query(
    "text_freq_spectrum",
    """
WITH tok AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS w
  FROM documents
),
tf AS (
  SELECT lang, w, count(*) AS n FROM tok GROUP BY 1, 2
),
vocab AS (
  SELECT lang, count(*) AS v FROM tf GROUP BY 1
)
SELECT tf.lang, tf.n AS occurrences,
  CAST(count(*) AS BIGINT) AS n_types,
  round(count(*) / CAST(any_value(vocab.v) AS DOUBLE), 6)
    AS frac_of_vocab
FROM tf JOIN vocab ON tf.lang = vocab.lang
WHERE tf.n <= 10
GROUP BY tf.lang, tf.n
""",
)
def text_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-frequency spectrum per language: how many distinct token
    types occur exactly k times (k ≤ 10), as counts and vocabulary
    share — the lexical-statistics profile (hapax legomena = the k=1
    row) that distinguishes natural text from templated spam and
    complements text_zipf_fit's head-rank fit with the tail shape
    Zipf's law actually lives in. Rides the SHARED session tf grain
    (corpus_grain.whitespace_tf_grain) — (lang, w) counts are a
    partial-aggregatable rollup of it since lang is functional on
    doc_id — then the spectrum over the vocab-sized frame plus a
    broadcast of the 5-row vocabulary totals; the k ≤ 10 cut bounds
    the output at langs × 10 regardless of corpus size.
    """
    from sparkify_datalake_spark.operators.corpus_grain import (
        whitespace_tf_grain,
    )

    tf = (
        whitespace_tf_grain(spark, sf_dir)
        .groupBy("lang", "w")
        .agg(F.sum("c").alias("n"))
    )
    vocab = tf.groupBy("lang").agg(F.count(F.lit(1)).alias("v"))
    return (
        tf.filter(F.col("n") <= 10)
        .join(F.broadcast(vocab), "lang")
        .groupBy("lang", F.col("n").alias("occurrences"))
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.round(
                F.count(F.lit(1)) / F.any_value("v").cast("double"), 6
            ).alias("frac_of_vocab"),
        )
    )


@query("text_compression_ratio")
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compression-ratio profile of the document corpus:
    zlib(level 6) bytes ÷ raw UTF-8 bytes, the classic boilerplate /
    repetition detector (C4 and Gopher both screen on it: templated or
    looping text compresses far below prose, random noise barely
    compresses at all). Complements text_repetition (explicit n-gram
    rates) with a single model-free scalar.

    Rows-only by design: DuckDB has no zlib surface, so there is no
    SQL oracle — correctness rests on (a) zlib being fully
    deterministic for a fixed level, making the run-to-run determinism
    guard exact, and (b) tests/test_text_ops.py recomputing ratios in
    plain Python for a sample and matching to 1e-9.

    Scale shape: one mapInPandas pass (Arrow batches, the kernel is a
    self-contained closure — driver workers import no repo modules)
    computes per-doc ratios; the finisher is a partial-aggregatable
    per-source rollup (count/avg/min/max + a sub-0.4 'suspect' count).
    Compression is CPU-bound and embarrassingly parallel — at 100 TB
    it scales with cores, no shuffle besides the 5-key rollup.
    """
    docs = load(spark, sf_dir, "documents").select("source", "text")

    def kernel(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf["text"].fillna("").str.encode("utf-8")
            n_raw = raw.str.len().astype("int64")
            n_zip = raw.map(
                lambda b: len(zlib.compress(b, 6))
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "source": pdf["source"],
                    "n_raw": n_raw,
                    "ratio": n_zip / n_raw.clip(lower=1),
                }
            )

    per_doc = docs.mapInPandas(
        kernel, "source string, n_raw long, ratio double"
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("ratio"), 6).alias("avg_ratio"),
        F.round(F.min("ratio"), 6).alias("min_ratio"),
        F.round(F.max("ratio"), 6).alias("max_ratio"),
        F.sum(
            F.when(F.col("ratio") < 0.4, 1).otherwise(0)
        ).cast("long").alias("n_template_suspect"),
    )


@query(
    "dedup_yield_report",
    """
WITH cl AS (
  SELECT md5(array_to_string(
           list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS h,
         count(*) AS sz
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
SELECT CAST(sz AS BIGINT) AS cluster_size,
  CAST(count(*) AS BIGINT) AS n_clusters,
  CAST(sz * count(*) AS BIGINT) AS n_docs,
  round(sz * count(*) / t.n_docs, 6) AS pct_of_corpus
FROM cl CROSS JOIN tot t
GROUP BY sz, t.n_docs
ORDER BY cluster_size
""",
)
def dedup_yield_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield report: cluster-size distribution at the
    bag-of-words-exact tier (docs sharing the identical distinct
    token SET — the normalization between byte-exact dedup_exact,
    which this corpus defeats with shuffled word order, and the
    probabilistic LSH tiers) — the one-page summary a corpus pipeline
    prints after a dedup pass ('38% of the crawl is copies of 2% of
    the pages'; here it exposes the fixture's 26-doc template
    family). Complements the dedup operators themselves (which emit
    survivors; this quantifies what WOULD be removed and whether
    duplication concentrates in a few template families or spreads
    across many pairs).

    Scale shape: one partial-aggregatable groupBy on a 16-byte hash
    of the normalized form (never the text — dedup_block_exact's
    discipline),
    then a re-agg of the per-cluster sizes, with the corpus total as
    a 1-row broadcast. Integer counts; the only double is the final
    share, divided from identical integers in both engines.
    """
    docs = load(spark, sf_dir, "documents")
    sig = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(F.array_distinct(F.split(F.col("text"), " "))),
        )
    )
    cl = docs.groupBy(sig.alias("h")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    tot = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (
        cl.crossJoin(F.broadcast(tot))
        .groupBy("sz", "n_docs")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("sz").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("sz") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
            F.round(
                F.col("sz") * F.col("n_clusters") / F.col("n_docs"), 6
            ).alias("pct_of_corpus"),
        )
        .orderBy("cluster_size")
    )


@query(
    "dedup_cross_source_overlap",
    """
WITH fp AS (
  SELECT DISTINCT source,
    md5(array_to_string(
      list_sort(list_distinct(string_split(text, ' '))), ' ')) AS h
  FROM documents
),
n AS (SELECT source, count(*) AS n_fp FROM fp GROUP BY 1),
ov AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS n_shared
  FROM fp a JOIN fp b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b,
  CAST(na.n_fp AS BIGINT) AS n_a,
  CAST(nb.n_fp AS BIGINT) AS n_b,
  CAST(n_shared AS BIGINT) AS n_shared,
  round(n_shared / CAST(least(na.n_fp, nb.n_fp) AS DOUBLE), 6)
    AS containment
FROM ov
JOIN n na ON na.source = source_a
JOIN n nb ON nb.source = source_b
ORDER BY source_a, source_b
""",
)
def dedup_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination audit: for every source pair that
    shares content, how many bag-of-words fingerprints they have in
    common and the containment ratio (shared ÷ smaller side) — the
    'does dataset A leak into dataset B' matrix every multi-corpus
    training build needs before mixing (text_contamination checks
    docs against an EVAL set; this checks sources against each
    other).

    Scale shape: docs collapse to DISTINCT (source, 16-byte
    fingerprint) once; the pair counting is ONE self-equi-join on the
    fingerprint — fan-out bounded by how many sources actually share
    a given fingerprint (cf. the LSH mega-bucket discipline: a
    fingerprint present in all 20 sources contributes C(20,2) pairs,
    still constant), never |docs|². Per-source totals are a 20-row
    broadcast; counts are integers, containment divides them.
    """
    docs = load(spark, sf_dir, "documents")
    sig = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(F.array_distinct(F.split(F.col("text"), " "))),
        )
    )
    # four consumers (self-join a/b + two totals): materialize the
    # distinct fingerprint grain once instead of re-scanning documents
    fp = (
        docs.select("source", sig.alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = fp.groupBy("source").agg(F.count(F.lit(1)).alias("n_fp"))
    a, b = fp.alias("a"), fp.alias("b")
    ov = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = n.select(
        F.col("source").alias("source_a"), F.col("n_fp").alias("n_a")
    )
    nb = n.select(
        F.col("source").alias("source_b"), F.col("n_fp").alias("n_b")
    )
    return (
        ov.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared")
                / F.least("n_a", "n_b").cast("double"),
                6,
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


@query(
    "text_langid_eval",
    f"""
WITH scored AS (
  SELECT doc_id, lang,
  {_LANGID_SCORES}
  FROM documents
),
pred AS (
  SELECT lang,
    CASE WHEN {_LANGID_BEST} = 0 THEN 'und'
         WHEN score_en = {_LANGID_BEST} THEN 'en'
         WHEN score_de = {_LANGID_BEST} THEN 'de'
         WHEN score_es = {_LANGID_BEST} THEN 'es'
         WHEN score_fr = {_LANGID_BEST} THEN 'fr'
         ELSE 'zh' END AS lid_guess
  FROM scored
),
m AS (
  SELECT lang, lid_guess, count(*) AS n FROM pred GROUP BY 1, 2
),
t AS (SELECT lang, sum(n) AS tot FROM m GROUP BY 1)
SELECT m.lang, m.lid_guess,
  CAST(n AS BIGINT) AS n,
  round(n / CAST(tot AS DOUBLE), 6) AS recall_share
FROM m JOIN t ON t.lang = m.lang
ORDER BY m.lang, m.lid_guess
""",
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the marker-based lid_guess of
    text_langid rolled up against the corpus's stored `lang` labels,
    with per-true-language recall shares — the eval that tells you
    whether the heuristic is shippable BEFORE it routes documents
    (sim_centroid_classify is the embedding-space twin of this
    text-space probe).

    Reuses text_langid's scoring verbatim (one definition, two
    consumers — the eval can never drift from the classifier it
    evaluates); the rollup is a |langs|² confusion grid with totals
    re-aggregated from the grid itself, so the whole finisher touches
    ≤ 36 rows. One corpus scan, map-side marker intersections, one
    tiny shuffle.
    """
    per_doc = text_langid(spark, sf_dir)
    m = per_doc.groupBy("lang", "lid_guess").agg(
        F.count(F.lit(1)).alias("n")
    )
    # totals via a window over the ≤36-row grid: a groupBy+join would
    # re-derive the scored subtree and scan the corpus twice
    tot = F.sum("n").over(Window.partitionBy("lang"))
    return (
        m.select(
            "lang",
            "lid_guess",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / tot.cast("double"), 6).alias(
                "recall_share"
            ),
        )
        .orderBy("lang", "lid_guess")
    )


@query(
    "text_bigram_surprisal",
    """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
),
pairs AS (
  SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM (
    SELECT doc_id,
      unnest(list_transform(range(1, len(ws)),
          i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS pr
    FROM t)
),
f2 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
f1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_bigrams,
  round(avg(-log2(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))), 4)
    AS bits_per_bigram
FROM pairs JOIN f2 USING (w1, w2) JOIN f1 USING (w1)
GROUP BY doc_id
""",
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram surprisal per document (bits/bigram): mean
    -log2 p(w2|w1) under the corpus's own bigram LM — one model order
    above text_unigram_surprisal, and the sharper template detector
    (boilerplate repeats bigrams it fully predicts: near-0 bits;
    natural prose stays several bits). The perplexity-filter shape of
    CCNet/Gopher corpus pruning, closed over the fixture so it is
    exactly checkable.

    Same two-pass scale shape as the unigram twin: bigram and
    first-token frequency tables are vocabulary-sized groupBys
    (partial-aggregated map-side), then join back onto the pair
    stream. The conditional denominator is c(w1,·) — counted over the
    SAME pair stream, so p(w2|w1) = c12/c1 is a proper distribution
    per w1. Docs with a single token have no bigram and are absent in
    both engines. At 100 TB the unigram table still broadcasts; the
    bigram table (~100M types on web corpora) crosses the broadcast
    threshold and AQE picks the shuffle join — both joins here are
    left unhinted for exactly that reason. Averaging in DOUBLE with
    4dp rounding absorbs libm log2 drift (counts ≤ 6 digits ⇒ ratios
    exact to 2^-47).
    """
    docs = load(spark, sf_dir, "documents")
    # ONE pair-stream join, not two (r12): the surprisal is attached to
    # the bigram TYPE table (a vocabulary-grain f2⋈f1 join), so the
    # 16M-row pair stream is joined once — the former pairs⋈f2⋈f1
    # chain paid a second full-stream join keyed on w1 (at web scale,
    # where the type tables cross the broadcast threshold, that was a
    # second full shuffle of the stream). f1 stays a direct rollup of
    # the raw stream: deriving it from f2 (c1 = Σ_w2 c12, output-
    # identical) was A/B-measured SLOWER at sf0.1 (1.14 vs 0.81 s) —
    # it serializes f1 behind f2's exchange where the map-side partial
    # agg of the raw stream overlaps it for free. Checkpointing
    # alternatives stay measured-out (r11: token-frame checkpoint
    # 11.6 s vs 11.3, pair-stream 14.6, (doc,w1,w2) cells 22.4 at 64×).
    t = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    ).where(F.size("ws") >= 2)
    pairs = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws)-1),"
                " i -> struct(ws[i-1] AS w1, ws[i] AS w2))"
            )
        ).alias("pr"),
    ).select("doc_id", "pr.w1", "pr.w2")
    f2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    f1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    surprisal = -F.log2(
        F.col("c12").cast("double") / F.col("c1").cast("double")
    )
    scored = f2.join(f1, "w1").select(
        "w1", "w2", surprisal.alias("s")
    )
    return (
        pairs.join(scored, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("s"), 4).alias("bits_per_bigram"),
        )
    )


@query(
    "text_burstiness",
    """
WITH tf AS (
  SELECT doc_id, w, count(*) AS c FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
    FROM documents) t
  GROUP BY 1, 2
),
n AS (SELECT count(*) AS n_docs FROM documents),
term AS (
  SELECT w, sum(c) AS total, sum(c * c) AS sq, count(*) AS df
  FROM tf GROUP BY w
),
top AS (
  SELECT w, total, sq, df FROM term
  ORDER BY total DESC, w LIMIT 30
)
SELECT w AS term,
  CAST(total AS BIGINT) AS total,
  CAST(df AS BIGINT) AS doc_freq,
  round(CAST(total AS DOUBLE) / n.n_docs, 6) AS mean_per_doc,
  round((CAST(sq AS DOUBLE) / n.n_docs)
        - (CAST(total AS DOUBLE) / n.n_docs)
          * (CAST(total AS DOUBLE) / n.n_docs), 6) AS var_per_doc,
  round(((CAST(sq AS DOUBLE) / n.n_docs)
         - (CAST(total AS DOUBLE) / n.n_docs)
           * (CAST(total AS DOUBLE) / n.n_docs))
        / (CAST(total AS DOUBLE) / n.n_docs), 6) AS fano
FROM top CROSS JOIN n
""",
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness profile: per high-frequency term, the Fano
    factor (variance-to-mean of its per-document count, zeros
    included) — bursty terms (Fano ≫ 1) cluster in few documents
    (topical/template markers) while Fano ≈ 1 is Poisson background;
    the lexical-dispersion screen beside text_zipf_fit (head shape)
    and text_freq_spectrum (tail shape).

    The zero-count documents never materialize: with Σc and Σc² over
    the documents CONTAINING the term, the all-docs moments follow
    from the corpus size alone (zeros add nothing to either sum) — so
    the plan is the SHARED tf grain (corpus_grain.whitespace_tf_grain —
    tokenized once per session, reused by the spectrum/surprisal/
    collocation siblings), a vocabulary-sized rollup, a top-30 bounded
    heap, and one broadcast scalar. All inputs to the ratios are exact
    integers, so 6dp rounding is engine-exact.
    """
    from sparkify_datalake_spark.operators.corpus_grain import (
        whitespace_tf_grain,
    )

    docs = load(spark, sf_dir, "documents")
    tf = whitespace_tf_grain(spark, sf_dir)
    term = tf.groupBy("w").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
        F.count(F.lit(1)).alias("df"),
    )
    top = term.orderBy(F.col("total").desc(), "w").limit(30)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    mean = F.col("total").cast("double") / F.col("n_docs")
    var = (F.col("sq").cast("double") / F.col("n_docs")) - mean * mean
    return top.crossJoin(F.broadcast(n)).select(
        F.col("w").alias("term"),
        F.col("total").cast("long").alias("total"),
        F.col("df").cast("long").alias("doc_freq"),
        F.round(mean, 6).alias("mean_per_doc"),
        F.round(var, 6).alias("var_per_doc"),
        F.round(var / mean, 6).alias("fano"),
    )


_LINE_W = 10  # words per synthetic "line" (the fixture corpus has no
# newlines, so segmentation is fixed 10-word blocks; on a real corpus the
# same plan runs on split(text, '\n') — only the segmenter expression
# changes, never the dedup topology)


@query(
    "text_line_dedup",
    f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
seg AS (
  SELECT doc_id, unnest(list_transform(
    range(0, greatest(CAST(ceil(len(ws) / {_LINE_W}.0) AS INT), 1)),
    b -> array_to_string(ws[(b*{_LINE_W}+1):(b*{_LINE_W}+{_LINE_W})], ' ')
  )) AS s
  FROM words
),
freq AS (
  SELECT s, count(DISTINCT doc_id) AS df FROM seg GROUP BY s
),
tagged AS (
  SELECT seg.doc_id, CASE WHEN freq.df >= 2 THEN 1 ELSE 0 END AS dup
  FROM seg JOIN freq ON seg.s = freq.s
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(dup) AS BIGINT) AS n_removed,
  round(sum(dup) * 1.0 / count(*), 6) AS pct_removed
FROM tagged GROUP BY doc_id
ORDER BY doc_id
""",
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-line removal — the CCNet/C4 paragraph-level
    dedup pass that runs BEFORE document-level dedup in every web-scale
    LLM corpus pipeline: a line (boilerplate nav text, cookie banner,
    license header) that appears in >= 2 distinct documents is removed
    from ALL of them, which document-grain MinHash can never do because
    the host documents are not near-duplicates of each other.

    Per-doc audit output (line counts, removed counts, removed fraction)
    rather than rewritten text, the dedup_yield_report discipline.

    Scale shape (100 TB): explode docs to the line grain map-side; ONE
    shuffle keyed on md5(line) (16-byte keys, never the line text — the
    dedup_exact discipline) counts distinct containing docs per line; the
    verdict joins back to the line grain on the same 16-byte key (a
    dim-attach with bounded linear fan-out, not pair generation); one
    re-aggregation to doc grain. No all-pairs stage anywhere — cost is
    O(total lines), which is why CCNet runs this at Common-Crawl scale.
    The corpus here has no newlines, so "line" = fixed 10-word block
    (127 cross-doc duplicate blocks exist at sf0.01); the segmenter is
    one pluggable expression.
    """
    docs = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n_seg = F.greatest(
        F.ceil(F.size(ws) / float(_LINE_W)).cast("int"), F.lit(1)
    )
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda b: F.array_join(
            F.slice(ws, b * _LINE_W + 1, _LINE_W), " "
        ),
    )
    # the line grain feeds BOTH the frequency build and the verdict
    # join; Spark re-derives common subtrees, so without the lazy
    # checkpoint the corpus is scanned+exploded+hashed twice
    seg = (
        docs.select("doc_id", F.explode(segs).alias("s"))
        .select("doc_id", F.md5(F.col("s")).alias("sh"))
        .localCheckpoint(eager=False)
    )
    freq = seg.groupBy("sh").agg(
        F.countDistinct("doc_id").alias("df")
    )
    tagged = seg.join(freq, "sh").select(
        "doc_id", F.when(F.col("df") >= 2, 1).otherwise(0).alias("dup")
    )
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("dup").cast("long").alias("n_removed"),
            F.round(
                F.sum("dup") / F.count(F.lit(1)).cast("double"), 6
            ).alias("pct_removed"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_perplexity_filter",
    """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws,
    substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'cb' AS is_train
  FROM documents
),
tp AS (
  SELECT pr.w1 AS w1, pr.w2 AS w2 FROM (
    SELECT unnest(list_transform(range(1, len(ws)),
        i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS pr
    FROM t WHERE is_train)
),
f2 AS (SELECT w1, w2, count(*) AS c12 FROM tp GROUP BY 1, 2),
f1 AS (SELECT w1, count(*) AS c1 FROM tp GROUP BY 1),
v AS (
  SELECT count(DISTINCT w) AS vocab FROM (
    SELECT unnest(ws) AS w FROM t WHERE is_train)
),
sp AS (
  SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS pr
    FROM t WHERE NOT is_train)
),
bits AS (
  SELECT sp.doc_id,
    -log2((coalesce(f2.c12, 0) + 0.5)
          / (coalesce(f1.c1, 0) + 0.5 * v.vocab)) AS b
  FROM sp LEFT JOIN f2 ON sp.w1 = f2.w1 AND sp.w2 = f2.w2
          LEFT JOIN f1 ON sp.w1 = f1.w1
          CROSS JOIN v
),
perdoc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
    round(avg(b), 4) AS ppl_bits
  FROM bits GROUP BY doc_id
),
ranked AS (
  SELECT *, percent_rank() OVER (ORDER BY ppl_bits, doc_id) AS pr
  FROM perdoc
)
SELECT doc_id, n_bigrams, ppl_bits,
  CASE WHEN pr < 1.0/3 THEN 'head'
       WHEN pr < 2.0/3 THEN 'middle' ELSE 'tail' END AS bucket
FROM ranked
ORDER BY doc_id
""",
)
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's held-out perplexity filter, the step the in-corpus
    surprisal ops deliberately are not: a SMOOTHED bigram LM is fitted
    on the deterministic ~80% train split (split_train_valid_test's md5
    boundary, so the model never sees the docs it scores), every
    held-out document is scored in bits/bigram under add-half smoothing
    p(w2|w1) = (c12 + 0.5)/(c1 + 0.5·V) — finite on UNSEEN bigrams and
    unseen history words (1/V), which in-corpus scoring never has to
    face — and docs are bucketed head/middle/tail by perplexity rank,
    exactly the head/middle/tail routing CCNet ships to pick what enters
    training. Buckets derive from percent_rank over the ROUNDED score
    with doc_id tiebreaks (engine-stable cuts).

    Scale (100 TB): the LM tables are vocabulary-sized groupBys of the
    train pair stream (map-side combined); scoring is two left joins of
    the held-out pair stream against them (unhinted — unigram table
    broadcasts, a web-scale bigram table crosses the threshold and AQE
    shuffles, the text_bigram_surprisal rationale); V rides a broadcast
    1-row frame. The global tercile window sorts only the per-DOC score
    frame (three orders smaller than the corpus); at web scale the cuts
    would come from approx_percentile on that same frame instead —
    the boundary move is one expression.
    """
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.split(F.lower(F.col("text")), " ").alias("ws"),
        (
            F.expr("substring(md5(cast(doc_id AS string)), 1, 2)") <= "cb"
        ).alias("is_train"),
    )
    pair_expr = F.explode(
        F.expr(
            "transform(sequence(1, size(ws)-1),"
            " i -> struct(ws[i-1] AS w1, ws[i] AS w2))"
        )
    ).alias("pr")
    tp = (
        t.filter("is_train")
        .where(F.size("ws") >= 2)
        .select(pair_expr)
        .select("pr.w1", "pr.w2")
    )
    f2 = tp.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # NOT derived from f2 (c1 = Σ_w2 c12 is output-identical): the
    # rollup serializes f1 behind f2's exchange, where the direct
    # map-side partial agg of the train stream overlaps it for free —
    # A/B-measured slower at sf0.1 (r12; the text_bigram_surprisal
    # finding).
    f1 = tp.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = (
        t.filter("is_train")
        .select(F.explode("ws").alias("w"))
        .agg(F.countDistinct("w").alias("vocab"))
    )
    sp = (
        t.filter(~F.col("is_train"))
        .where(F.size("ws") >= 2)
        .select("doc_id", pair_expr)
        .select("doc_id", "pr.w1", "pr.w2")
    )
    bits = (
        sp.join(f2, ["w1", "w2"], "left")
        .join(f1, ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            (
                -F.log2(
                    (F.coalesce(F.col("c12"), F.lit(0)) + 0.5)
                    / (
                        F.coalesce(F.col("c1"), F.lit(0))
                        + 0.5 * F.col("vocab")
                    )
                )
            ).alias("b"),
        )
    )
    perdoc = bits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("b"), 4).alias("ppl_bits"),
    )
    w = Window.orderBy("ppl_bits", "doc_id")
    return (
        perdoc.select(
            "doc_id",
            "n_bigrams",
            "ppl_bits",
            F.percent_rank().over(w).alias("pr"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "ppl_bits",
            F.when(F.col("pr") < 1.0 / 3, "head")
            .when(F.col("pr") < 2.0 / 3, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


_TTR_WIN = 50


@query(
    "text_ttr_windowed",
    f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
    unnest(range(1, len(string_split(lower(text), ' ')) + 1)) AS pos
  FROM documents
),
win AS (
  SELECT doc_id, CAST(floor((pos - 1) / {_TTR_WIN}.0) AS BIGINT) AS w,
    count(DISTINCT tok) AS n_types, count(*) AS n_toks
  FROM toks GROUP BY 1, 2
)
SELECT doc_id,
  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
  CAST(count(*) AS BIGINT) AS n_windows,
  round(avg(n_types * 1.0 / n_toks), 6) AS mattr,
  round(min(n_types * 1.0 / n_toks), 6) AS min_ttr
FROM win GROUP BY doc_id
""",
)
def text_ttr_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed type-token ratio (MATTR-style lexical diversity): each
    document's token stream is cut into 50-token (_TTR_WIN) tumbling
    windows, TTR = distinct/total per window, and the doc reports the
    mean and min — the length-robust replacement for raw TTR (which
    decays mechanically with doc length, so long docs always look
    "less diverse") and the repetition signal quality gates want:
    templated/looping text shows a LOW min_ttr long before the global
    vocabulary statistics (text_vocab_growth's Heaps fit) notice.

    Tumbling (not sliding) windows keep the computation one
    aggregation: posexplode to (doc, window, token) grain, a
    partial-aggregatable distinct count per window, then a per-doc
    fold over ≤ n_tokens/_TTR_WIN window rows. Exact integer
    ratios behind 6dp rounds; window boundaries are pure position
    arithmetic, so both engines bucket identically.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias(
            "pos0", "tok"
        ),
    )
    win = toks.groupBy(
        "doc_id",
        F.floor(F.col("pos0") / _TTR_WIN).cast("long").alias("w"),
    ).agg(
        F.countDistinct("tok").alias("n_types"),
        F.count(F.lit(1)).alias("n_toks"),
    )
    ttr = F.col("n_types") / F.col("n_toks").cast("double")
    return win.groupBy("doc_id").agg(
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.round(F.avg(ttr), 6).alias("mattr"),
        F.round(F.min(ttr), 6).alias("min_ttr"),
    )


_PREFIX_DEDUP_CHARS = 120


@query(
    "dedup_prefix",
    f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
    md5(substring(text, 1, {_PREFIX_DEDUP_CHARS})) AS pk,
    md5(text) AS fk
  FROM documents
),
cluster AS (
  SELECT pk,
    min(doc_id) AS survivor_id,
    count(*) AS n_members,
    count(DISTINCT fk) AS n_full_variants,
    CAST(min(n_chars) AS BIGINT) AS min_chars,
    CAST(max(n_chars) AS BIGINT) AS max_chars
  FROM keyed GROUP BY pk
)
SELECT survivor_id, n_members, n_full_variants,
  n_full_variants > 1 AS is_truncation_family,
  min_chars, max_chars
FROM cluster WHERE n_members > 1
ORDER BY survivor_id
""",
)
def dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix dedup — the truncation-duplicate detector exact dedup
    misses: crawls routinely carry the same article cut at different
    lengths (pagination, reader-mode extraction, feed summaries), so
    byte-exact hashing sees N distinct documents. Clustering on the
    md5 of the first _PREFIX_DEDUP_CHARS (120) characters groups those
    families in ONE map-side hash + one shuffle; n_full_variants
    distinguishes true truncation families (same prefix, different
    full text — is_truncation_family) from families exact dedup would
    also catch, and min/max_chars show the truncation spread. Between
    dedup_exact (byte-identical only) and the MinHash stack (any
    near-dup, ~8 hashes + banding + verify) this is the cheap middle
    tier real pipelines run first.

    Scale shape: identical to dedup_exact — the shuffle key is a
    16-byte hash, survivors aggregate with min/count, output is
    cluster-sized not corpus-sized. The ≤120-char
    substring bounds per-row hash cost regardless of document length.
    """
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.md5(F.substring("text", 1, _PREFIX_DEDUP_CHARS)).alias("pk"),
        F.md5("text").alias("fk"),
    )
    return (
        keyed.groupBy("pk")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct("fk").alias("n_full_variants"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .filter(F.col("n_members") > 1)
        .select(
            "survivor_id",
            "n_members",
            "n_full_variants",
            (F.col("n_full_variants") > 1).alias("is_truncation_family"),
            "min_chars",
            "max_chars",
        )
        .orderBy("survivor_id")
    )


_DNC_N = 5  # shingle width for duplicate-n-gram coverage


@query(
    "text_dup_ngram_coverage",
    f"""
WITH sh AS (
  SELECT doc_id, unnest(
    list_distinct(list_transform(
      range(1, len(string_split(lower(text),' ')) - {_DNC_N - 2}),
      i -> concat({", ' ', ".join(
          f"string_split(lower(text),' ')[i+{j}]" for j in range(_DNC_N)
      ).replace(", ' ', ", ", ' ', ")}))))
    AS g
  FROM documents
  WHERE len(string_split(lower(text),' ')) >= {_DNC_N}
),
gram_docs AS (
  SELECT g, count(*) AS n_docs FROM sh GROUP BY 1
),
per_doc AS (
  SELECT s.doc_id,
    count(*) AS n_grams,
    sum(CASE WHEN gd.n_docs > 1 THEN 1 ELSE 0 END) AS n_dup
  FROM sh s JOIN gram_docs gd USING (g)
  GROUP BY 1
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
  CAST(n_dup AS BIGINT) AS n_dup_grams,
  round(n_dup * 1.0 / n_grams, 6) AS dup_frac,
  round(n_dup * 1.0 / n_grams, 6) > 0.5 AS flag_dup_heavy
FROM per_doc ORDER BY doc_id
""",
)
def text_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-n-gram coverage — the Gopher/Dolma repetition signal
    that looks ACROSS documents where text_repetition looks within:
    for each document, the fraction of its distinct word-5-grams that
    also appear in at least one other document. High coverage means
    the doc is assembled from corpus-common phrasing (boilerplate,
    templates, near-dup fragments below the dedup threshold) — the
    docs MinHash keeps but a quality-weighted sampler should
    down-weight; the 0.5 flag is the conventional gate.

    Scale shape: distinct shingles explode to (doc, gram) grain ONCE;
    gram document-frequency is a partial-aggregatable groupBy on the
    gram (at 100 TB: hash the gram to 16 bytes first — the
    text_line_dedup discipline); the join back is gram-keyed, and the
    per-doc rollup ends at doc grain. No pairs are ever enumerated —
    this reads the same signal dedup_ngram's O(n²) anchor measures,
    at O(total grams).
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    concat_expr = "concat(" + ", ' ', ".join(
        f"toks[i+{j}]" for j in range(_DNC_N)
    ) + ")"
    sh = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= _DNC_N)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(0, size(toks) - {_DNC_N}), "
                        f"i -> {concat_expr})"
                    )
                )
            ).alias("g"),
        )
    )
    # eager: sh feeds the df aggregate AND the join-back as concurrent
    # branches — unchecked, the explode+array_distinct subtree (the
    # op's dominant CPU) runs twice; lazy would race the branches
    sh = sh.localCheckpoint()
    gram_docs = sh.groupBy("g").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        sh.join(gram_docs, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias(
                "n_dup"
            ),
        )
    )
    frac = F.round(F.col("n_dup") / F.col("n_grams").cast("double"), 6)
    return per_doc.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_dup").cast("long").alias("n_dup_grams"),
        frac.alias("dup_frac"),
        (frac > 0.5).alias("flag_dup_heavy"),
    ).orderBy("doc_id")


@query(
    "text_ngram_novelty_curve",
    f"""
WITH sh AS (
  SELECT doc_id, unnest(
    list_distinct(list_transform(
      range(1, len(string_split(lower(text),' ')) - 1),
      i -> concat(string_split(lower(text),' ')[i], ' ',
                  string_split(lower(text),' ')[i+1], ' ',
                  string_split(lower(text),' ')[i+2]))))
    AS g
  FROM documents
  WHERE len(string_split(lower(text),' ')) >= 3
),
first_seen AS (
  SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY 1
),
per_doc AS (
  SELECT s.doc_id,
    count(*) AS n_grams,
    sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS n_new
  FROM sh s JOIN first_seen f USING (g)
  GROUP BY 1
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
  CAST(n_new AS BIGINT) AS n_new_grams,
  round(n_new * 1.0 / n_grams, 6) AS novelty,
  CAST(sum(n_new) OVER (ORDER BY doc_id) AS BIGINT) AS cum_vocab_3g
FROM per_doc ORDER BY doc_id
""",
)
def text_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty curve — the corpus-saturation signal data
    curation decides "collect more?" with: for each document in ingest
    (doc_id) order, the fraction of its distinct word-3-grams never
    seen in any earlier document, plus the running 3-gram vocabulary.
    A healthy growing corpus holds novelty roughly flat (Heaps-law
    regime, the n-gram analog of text_vocab_growth's token curve); a
    saturating or template-heavy crawl decays toward 0 — and the
    per-doc novelty doubles as a quality score (near-0 novelty late in
    the crawl ≈ assembled from seen phrasing, the
    text_dup_ngram_coverage signal made temporal).

    Scale shape: distinct 3-grams explode ONCE to (doc, gram) grain;
    first-occurrence is one partial-aggregatable min(doc_id) per gram
    (the text_vocab_growth discipline — running-distinct without any
    running state); the join back is gram-keyed; the cumulative vocab
    is a window over the |docs|-row frame. At 100 TB, hash the gram to
    16 bytes first and the whole op is two 16-byte-keyed shuffles.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    sh = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(0, size(toks) - 3), "
                        "i -> concat(toks[i], ' ', toks[i+1], ' ', "
                        "toks[i+2]))"
                    )
                )
            ).alias("g"),
        )
    )
    # eager: sh feeds first-occurrence AND the join-back concurrently
    # (the dup_ngram_coverage shape) — checkpoint so the shingle
    # explode runs once
    sh = sh.localCheckpoint()
    first_seen = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(
                    0
                )
            ).alias("n_new"),
        )
    )
    w = Window.orderBy("doc_id")
    return per_doc.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_new").cast("long").alias("n_new_grams"),
        F.round(
            F.col("n_new") / F.col("n_grams").cast("double"), 6
        ).alias("novelty"),
        F.sum("n_new").over(w).cast("long").alias("cum_vocab_3g"),
    ).orderBy("doc_id")


_SPLIT_SQL = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)"
_SPLIT_SPARK = "substring(md5(cast(doc_id AS string)), 1, 2)"


@query(
    "text_js_drift_by_split",
    f"""
WITH labeled AS (
  SELECT CASE WHEN {_SPLIT_SQL} <= 'cb' THEN 'train'
              WHEN {_SPLIT_SQL} <= 'e5' THEN 'valid'
              ELSE 'test' END AS split,
    unnest(string_split(lower(text), ' ')) AS token
  FROM documents
),
counts AS (
  SELECT split, token, count(*) AS n FROM labeled GROUP BY 1, 2
),
totals AS (
  SELECT split, sum(n) AS tot FROM counts GROUP BY 1
),
p AS (
  SELECT token,
    coalesce(max(CASE WHEN c.split = 'train'
      THEN n / CAST(t.tot AS DOUBLE) END), 0.0) AS pt,
    coalesce(max(CASE WHEN c.split = 'valid'
      THEN n / CAST(t.tot AS DOUBLE) END), 0.0) AS pv,
    coalesce(max(CASE WHEN c.split = 'test'
      THEN n / CAST(t.tot AS DOUBLE) END), 0.0) AS ps
  FROM counts c JOIN totals t ON c.split = t.split
  GROUP BY token
)
SELECT 'valid' AS split,
  round(sum(
    CASE WHEN pt > 0 THEN 0.5 * pt * log2(pt / ((pt + pv) / 2)) ELSE 0 END
    + CASE WHEN pv > 0 THEN 0.5 * pv * log2(pv / ((pt + pv) / 2)) ELSE 0 END
  ), 6) AS js_vs_train_bits
FROM p
UNION ALL
SELECT 'test',
  round(sum(
    CASE WHEN pt > 0 THEN 0.5 * pt * log2(pt / ((pt + ps) / 2)) ELSE 0 END
    + CASE WHEN ps > 0 THEN 0.5 * ps * log2(ps / ((pt + ps) / 2)) ELSE 0 END
  ), 6)
FROM p
ORDER BY split
""",
)
def text_js_drift_by_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence of each held-out split's unigram
    distribution against TRAIN — the post-split audit beside
    split_source_balance (which checks the source MIX; this checks the
    actual token content): a high valid- or test-vs-train JS means the
    eval sets measure a different distribution than the model trains
    on, biasing every loss comparison. Uses THE md5 split the pipeline
    runs (same predicate as split_train_valid_test), so the number
    certifies the real artifact; near-0 here is the honest hash-split
    all-clear, and the same query pointed at a time- or source-based
    split is where it earns its keep.

    Shape: one token-grain pass to per-split counts (the
    text_js_divergence discipline extended to a 3-way pivot), the two
    divergences fold over the shared |vocab|-row frame in ONE
    aggregate pass each, zero-support terms pinned by CASE on both
    engines.
    """
    docs = load(spark, sf_dir, "documents")
    b = F.expr(_SPLIT_SPARK)
    labeled = docs.select(
        F.when(b <= "cb", "train")
        .when(b <= "e5", "valid")
        .otherwise("test")
        .alias("split"),
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    )
    counts = labeled.groupBy("split", "token").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("split").agg(F.sum("n").alias("tot"))
    pr = F.col("n") / F.col("tot").cast("double")

    def share(split):
        return F.coalesce(
            F.max(F.when(F.col("split") == split, pr)), F.lit(0.0)
        )

    p = (
        counts.join(F.broadcast(totals), "split")
        .groupBy("token")
        .agg(
            share("train").alias("pt"),
            share("valid").alias("pv"),
            share("test").alias("ps"),
        )
        .localCheckpoint(eager=False)  # two divergence consumers
    )

    def js(a, bcol):
        m = (F.col(a) + F.col(bcol)) / 2
        ta = F.when(
            F.col(a) > 0, 0.5 * F.col(a) * F.log2(F.col(a) / m)
        ).otherwise(0.0)
        tb = F.when(
            F.col(bcol) > 0, 0.5 * F.col(bcol) * F.log2(F.col(bcol) / m)
        ).otherwise(0.0)
        return F.round(F.sum(ta + tb), 6)

    valid = p.agg(js("pt", "pv").alias("js_vs_train_bits")).select(
        F.lit("valid").alias("split"), "js_vs_train_bits"
    )
    test = p.agg(js("pt", "ps").alias("js_vs_train_bits")).select(
        F.lit("test").alias("split"), "js_vs_train_bits"
    )
    return valid.unionByName(test).orderBy("split")


@query(
    "dedup_cluster_sizes",
    """
WITH g AS (
  SELECT count(*) AS sz FROM documents GROUP BY text
),
tot AS (
  SELECT CAST(sum(sz) AS BIGINT) AS n_docs_total FROM g
)
SELECT CAST(sz AS BIGINT) AS cluster_size,
  CAST(count(*) AS BIGINT) AS n_clusters,
  CAST(sz * count(*) AS BIGINT) AS n_docs,
  round((sz * count(*)) / CAST(t.n_docs_total AS DOUBLE), 6) AS doc_share
FROM g CROSS JOIN tot t
GROUP BY sz, t.n_docs_total
""",
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size spectrum: how many dup clusters
    exist at each size and what share of the corpus sits in them — the
    count-of-counts histogram that tells a curation run whether its
    duplication is a few mega-clusters (boilerplate/templates: cap or
    drop) or a long tail of doubletons (crawl overlap: plain dedup
    suffices). Complements dedup_exact (the survivor map) and
    dedup_yield_report (pipeline yield) with the distribution view —
    the same spectrum text_freq_spectrum computes for tokens, lifted
    to duplicate groups.

    Scale shape: groupBy md5(text) — the dedup_exact 16-byte-key
    shuffle discipline — then a count-of-counts re-aggregate whose key
    space is tiny (distinct cluster sizes). The corpus total enters as
    one bounded scalar collect (metadata-cheap count), applied as a
    literal with the oracle's exact division, so no second scan joins
    back.
    """
    docs = load(spark, sf_dir, "documents")
    n_total = docs.count()
    return (
        docs.groupBy(F.md5("text").alias("_k"))
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("sz").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("sz") * F.col("n_clusters")).cast("long").alias("n_docs"),
            F.round(
                (F.col("sz") * F.col("n_clusters"))
                / F.lit(float(n_total)),
                6,
            ).alias("doc_share"),
        )
    )


@query(
    "text_hapax_stats",
    """
WITH tok AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
),
counts AS (
  SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2
)
SELECT lang,
  CAST(sum(n) AS BIGINT) AS n_tokens,
  CAST(count(*) AS BIGINT) AS vocab_size,
  CAST(count(CASE WHEN n = 1 THEN 1 END) AS BIGINT) AS hapax_count,
  CAST(count(CASE WHEN n = 2 THEN 1 END) AS BIGINT) AS dis_count,
  round(count(CASE WHEN n = 1 THEN 1 END) / CAST(count(*) AS DOUBLE), 6)
    AS hapax_vocab_ratio,
  round(count(CASE WHEN n = 1 THEN 1 END) / CAST(sum(n) AS DOUBLE), 6)
    AS hapax_token_share
FROM counts GROUP BY lang
""",
)
def text_hapax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax/dis legomena profile per language: vocabulary size, the
    once- and twice-occurring type counts, and their ratios — the
    lexical-sparsity readout a corpus curator reads next to
    text_vocab_growth (a high hapax share means the unigram LM tail is
    unestimated and near-dup shingling will under-weight rare spans;
    a LOW share on web text usually means boilerplate contraction).
    Good-Turing's N1/N is exactly hapax_token_share — the missing-mass
    estimate for unseen types.

    Scale shape: explode to (lang, token) → count (map-side partial
    combine does the heavy lift), then one tiny per-lang rollup whose
    key space is the language vocabulary — integer counts throughout,
    divisions only in the final projection, so the doubles are
    engine-exact before the cosmetic round.
    """
    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "lang",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    one = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    two = F.sum(F.when(F.col("n") == 2, 1).otherwise(0))
    return counts.groupBy("lang").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        one.cast("long").alias("hapax_count"),
        two.cast("long").alias("dis_count"),
        F.round(
            one / F.count(F.lit(1)).cast("double"), 6
        ).alias("hapax_vocab_ratio"),
        F.round(one / F.sum("n").cast("double"), 6).alias(
            "hapax_token_share"
        ),
    )


@query(
    "text_simpson_diversity",
    """
WITH tok AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
),
counts AS (
  SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2
)
SELECT lang,
  CAST(sum(n) AS BIGINT) AS n_tokens,
  CAST(count(*) AS BIGINT) AS vocab_size,
  round(sum(n * (n - 1)) / (sum(n) * CAST(sum(n) - 1 AS DOUBLE)), 6)
    AS simpson_lambda,
  round(1.0 - sum(n * (n - 1)) / (sum(n) * CAST(sum(n) - 1 AS DOUBLE)), 6)
    AS simpson_diversity,
  round(1.0 / (sum(n * (n - 1)) / (sum(n) * CAST(sum(n) - 1 AS DOUBLE))), 4)
    AS inverse_simpson
FROM counts GROUP BY lang
""",
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration / diversity of the token distribution per
    language, using the UNBIASED estimator λ = Σ n_i(n_i−1) / (N(N−1))
    (the probability two tokens drawn WITHOUT replacement are the same
    type). Complements the entropy-family readouts (text_zipf_fit,
    text_freq_spectrum, agg_entropy): λ is dominated by the head of
    the distribution where entropy is tail-sensitive, so the pair
    (λ, H) separates "peaked but long-tailed" from "flat" corpora;
    1/λ is the effective vocabulary ("how many equally-common types
    would look like this").

    Scale shape: same (lang, token) count grain as text_hapax_stats —
    map-side combine on the explode, one per-lang rollup. The
    numerator Σ n(n−1) and denominator N(N−1) are exact BIGINT sums;
    the single division is the only double, so the statistic is
    engine-exact to the bit before rounding.
    """
    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "lang",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ssq = F.sum(F.col("n") * (F.col("n") - 1))
    n_tok = F.sum("n")
    lam = ssq / (n_tok * (n_tok - 1).cast("double"))
    return counts.groupBy("lang").agg(
        n_tok.cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.round(lam, 6).alias("simpson_lambda"),
        F.round(F.lit(1.0) - lam, 6).alias("simpson_diversity"),
        F.round(F.lit(1.0) / lam, 4).alias("inverse_simpson"),
    )


@query(
    "text_js_attribution",
    """
WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS token
  FROM documents WHERE source IN ('src0', 'src1')
),
counts AS (
  SELECT source, token, count(*) AS n FROM tok GROUP BY 1, 2
),
totals AS (
  SELECT source, sum(n) AS tot FROM counts GROUP BY 1
),
p AS (
  SELECT token,
    coalesce(max(CASE WHEN c.source = 'src0'
      THEN n / CAST(t.tot AS DOUBLE) END), 0.0) AS p0,
    coalesce(max(CASE WHEN c.source = 'src1'
      THEN n / CAST(t.tot AS DOUBLE) END), 0.0) AS p1
  FROM counts c JOIN totals t ON c.source = t.source
  GROUP BY token
),
contrib AS (
  SELECT token, p0, p1,
    round(
      CASE WHEN p0 > 0
        THEN 0.5 * p0 * log2(p0 / ((p0 + p1) / 2)) ELSE 0 END
      + CASE WHEN p1 > 0
        THEN 0.5 * p1 * log2(p1 / ((p0 + p1) / 2)) ELSE 0 END,
      9) AS js_bits
  FROM p
),
ranked AS (
  SELECT token, p0, p1, js_bits,
    row_number() OVER (ORDER BY js_bits DESC, token) AS rk
  FROM contrib
)
SELECT CAST(rk AS BIGINT) AS rk, token,
  round(p0, 6) AS p0, round(p1, 6) AS p1,
  round(js_bits, 6) AS js_contrib_bits,
  CASE WHEN p0 > p1 THEN 'src0' ELSE 'src1' END AS leans_to
FROM ranked WHERE rk <= 15
""",
)
def text_js_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level ATTRIBUTION of the src0-vs-src1 Jensen-Shannon
    divergence: JS decomposes exactly into a per-token sum, so the
    top contributors ARE the answer to "which tokens make these two
    sources differ" — the drill-down text_js_divergence (the scalar)
    and text_js_drift_by_split (the split monitor) both need the
    moment their number trips an alert. leans_to marks the direction
    (which source over-represents the token).

    Determinism: contributions are computed from exact count/total
    divisions (identical doubles in both engines), ROUNDED to 9 dp
    BEFORE ranking so a last-ulp libm log2 difference cannot flip an
    order, with the token string as the total tie-break.

    Scale shape: same (source, token) count grain as
    text_js_divergence — map-side combine, token-keyed shuffle — then
    a rank over the vocabulary-sized contribution frame and a top-15
    cut. No new scan, no data-sized sort: the vocabulary is the
    frame.
    """
    docs = load(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    counts = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("source")
    probs = counts.select(
        "source",
        "token",
        (F.col("n") / F.sum("n").over(w_tot).cast("double")).alias("pr"),
    )
    p = probs.groupBy("token").agg(
        F.coalesce(
            F.max(F.when(F.col("source") == "src0", F.col("pr"))),
            F.lit(0.0),
        ).alias("p0"),
        F.coalesce(
            F.max(F.when(F.col("source") == "src1", F.col("pr"))),
            F.lit(0.0),
        ).alias("p1"),
    )
    m = (F.col("p0") + F.col("p1")) / 2
    term = (
        F.when(
            F.col("p0") > 0,
            0.5 * F.col("p0") * F.log2(F.col("p0") / m),
        ).otherwise(0.0)
        + F.when(
            F.col("p1") > 0,
            0.5 * F.col("p1") * F.log2(F.col("p1") / m),
        ).otherwise(0.0)
    )
    contrib = p.select(
        "token", "p0", "p1", F.round(term, 9).alias("js_bits")
    )
    w_rk = Window.orderBy(F.desc("js_bits"), F.asc("token"))
    return (
        contrib.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= 15)
        .select(
            F.col("rk").cast("long").alias("rk"),
            "token",
            F.round("p0", 6).alias("p0"),
            F.round("p1", 6).alias("p1"),
            F.round("js_bits", 6).alias("js_contrib_bits"),
            F.when(F.col("p0") > F.col("p1"), "src0")
            .otherwise("src1")
            .alias("leans_to"),
        )
    )
