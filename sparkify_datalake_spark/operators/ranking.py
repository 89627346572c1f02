"""Text ranking / retrieval scoring: TF-IDF and BM25 (SURVEY §2-I-bis
round-3 addendum — the scoring layer over the tokenize/stopword/
frequency machinery in operators/text.py).

Both operators are deterministic integer-count + double arithmetic
(ln/division, rounded 6dp), so unlike most retrieval stacks they are
HASH-CHECKED against the DuckDB oracle — same tokenizer
(split(lower(text), ' ')), same smoothing, same tiebreak.

Scale notes (100 TB):
- Everything is built-in-function SQL: one explode+groupBy for term
  frequencies (map-side partial agg), a broadcast of the per-term
  document frequencies (|query terms| rows), a broadcast of the 1-row
  corpus stats, and a bounded-heap top-k (TakeOrderedAndProject,
  plan-asserted) — the corpus never sorts globally and never shuffles
  by anything but (doc_id, token).
- The query-term filter lands BEFORE the tf groupBy, so the shuffled
  tf table is O(matching postings), not O(all tokens) — the inverted-
  index access path expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.operators.text import _sql_tokens, _tokens
from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load

# Fixed retrieval query (mid-frequency corpus terms with distinct
# document frequencies, so idf actually differentiates).
_TERMS = ["spark", "window", "hash", "vector"]
_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)
_BM25_K1 = 1.2
_BM25_B = 0.75


def _tf(docs: DataFrame) -> DataFrame:
    """(doc_id, token, tf) for query terms only — the posting lists."""
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    return (
        tok.filter(F.col("token").isin(_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


@query(
    "text_tfidf_topk",
    f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tokens()}) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM tok WHERE token IN ({_TERMS_SQL})
  GROUP BY doc_id, token
),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
stats AS (SELECT count(*) AS n FROM documents)
SELECT doc_id,
  round(sum(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0)), 6) AS tfidf_score
FROM tf JOIN dfreq USING (token), stats
GROUP BY doc_id
ORDER BY tfidf_score DESC, doc_id
LIMIT 20
""",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the fixed term query by smoothed TF-IDF.

    score(d) = Σ_t tf(t,d) · (ln((N+1)/(df(t)+1)) + 1) — the sklearn
    smoothing, so unseen-term idf stays finite. df and the corpus size
    broadcast (tiny); the ranking is a bounded heap, not a sort.
    """
    docs = load(spark, sf_dir, "documents")
    tf = _tf(docs)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(F.count(F.lit(1)).alias("n"))
    idf = F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(
        1.0
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("tf") * idf), 6).alias("tfidf_score"))
        .orderBy(F.col("tfidf_score").desc(), F.col("doc_id"))
        .limit(20)
    )


@query(
    "text_bm25_topk",
    f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tokens()}) AS token
  FROM documents
),
dl AS (
  SELECT doc_id, len({_sql_tokens()}) AS dl FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM tok WHERE token IN ({_TERMS_SQL})
  GROUP BY doc_id, token
),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
stats AS (
  SELECT count(*) AS n, avg(len({_sql_tokens()})) AS avgdl
  FROM documents
)
SELECT doc_id,
  round(sum(
    ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
    tf * ({_BM25_K1} + 1.0) /
    (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
  ), 6) AS bm25_score
FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id), stats
GROUP BY doc_id
ORDER BY bm25_score DESC, doc_id
LIMIT 20
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the fixed term query by Okapi BM25
    (k1=1.2, b=0.75, the Robertson-Sparck Jones idf with +1 smoothing).

    Same relational shape as TF-IDF plus per-document length
    normalization: dl comes map-side from size(split(...)) — no extra
    shuffle — and avgdl rides in the broadcast 1-row stats frame.
    """
    docs = load(spark, sf_dir, "documents")
    doclen = docs.select("doc_id", F.size(_tokens()).alias("dl"))
    tf = _tf(docs)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(_tokens())).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * F.lit(_BM25_K1 + 1.0) / norm
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25_score"))
        .orderBy(F.col("bm25_score").desc(), F.col("doc_id"))
        .limit(20)
    )


@query(
    "text_keywords_topk",
    f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tokens()}) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token),
stats AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, token,
    round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN dfreq USING (token), stats
)
SELECT doc_id, token, score
FROM (
  SELECT doc_id, token, score,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, token) AS rn
  FROM scored
)
WHERE rn <= 3
""",
)
def text_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document — the document-side dual of
    the query-side retrieval above (tagging/labeling pass every corpus
    catalog runs).

    Same smoothed TF-IDF arithmetic, but over the FULL vocabulary: tf
    shuffles once on (doc, token); the per-term document frequencies
    are vocabulary-sized and broadcast back; ranking is a per-doc
    window (row_number ≤ 3) on the same doc partitioning the final
    grouping would use. Determinism: scores are rounded to 6dp BEFORE
    ranking and ties break on the token string, so the selected
    keyword set is engine-exact.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df")
    )
    stats = docs.agg(F.count(F.lit(1)).alias("n"))
    score = F.round(
        F.col("tf")
        * (
            F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0
        ),
        6,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "token", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "score")
    )


_MIN_COLLOC_N = 5


@query(
    "text_collocations_pmi",
    f"""
WITH t AS (
  SELECT string_split(lower(text), ' ') AS toks FROM documents
),
bg AS (
  SELECT unnest(list_transform(range(1, greatest(len(toks), 1)),
                i -> toks[i] || ' ' || toks[i + 1])) AS b
  FROM t
),
bcnt AS (SELECT b, count(*) AS nb FROM bg GROUP BY 1),
uni AS (
  SELECT unnest(toks) AS w FROM t
),
ucnt AS (SELECT w, count(*) AS n FROM uni GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM uni) AS tt,
         (SELECT count(*) FROM bg) AS bb
)
SELECT
  split_part(b, ' ', 1) AS w1,
  split_part(b, ' ', 2) AS w2,
  CAST(nb AS BIGINT) AS n_bigram,
  round(ln(nb * CAST(s.tt AS DOUBLE) * s.tt / (s.bb * u1.n * u2.n)), 6)
    AS pmi
FROM bcnt
JOIN ucnt u1 ON u1.w = split_part(b, ' ', 1)
JOIN ucnt u2 ON u2.w = split_part(b, ' ', 2)
CROSS JOIN stats s
WHERE nb >= {_MIN_COLLOC_N}
ORDER BY nb * CAST(s.tt AS DOUBLE) * s.tt / (s.bb * u1.n * u2.n) DESC,
         w1, w2
LIMIT 20
""",
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations (adjacent word pairs) by pointwise mutual
    information over the document corpus — the phrase detector behind
    tokenizer merges and "new_york"-style phrase normalization, with
    the ≥5-count floor that keeps PMI from crowning one-off typos.
    PMI = ln(P(w1w2) / P(w1)P(w2)) computed as ONE double division of
    exact integer products (nb·T² / B·n1·n2), so both engines produce
    bit-identical scores and the ordering is float-safe (ties broken
    lexicographically). Counts: one explode+groupBy for bigrams, one
    for unigrams (both map-side partial-agg); unigram counts broadcast
    back onto the (bounded, ≥5-count) bigram frame; corpus totals ride
    a broadcast 1-row aggregate. The integer product nb·T² needs
    headroom at extreme scale — beyond ~1e18 switch the ratio to
    log-space subtraction, the documented 100 TB variant.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), " ").alias("toks"))
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (w, i) -> concat(w, ' ', toks[i + 1]))"
            )
        ).alias("b")
    )
    # Checkpoint the vocabulary-sized count tables: each has multiple
    # consumers (the u1/u2 joins and the corpus totals), and without
    # the pin every consumer re-runs its corpus explode+groupBy. The
    # totals tt/bb come from SUMS over these tiny frames, never from
    # a second count() pass over the exploded corpus — the original
    # shape ran the tokenize+explode FOUR times (16.0 s at the 64×
    # probe; 2 passes after this fix). At web scale the bigram table
    # crosses checkpoint-in-memory comfort — persist(DISK_ONLY) is
    # the drop-in swap.
    bcnt = bg.groupBy("b").agg(F.count(F.lit(1)).alias("nb")).localCheckpoint(
        eager=False
    )
    # Unigram counts roll up from the SHARED session tf grain
    # (corpus_grain.whitespace_tf_grain) — the burstiness/spectrum/
    # surprisal siblings tokenize once between them and this query
    # rides it, leaving the bigram explode above as its only own
    # corpus pass.
    from sparkify_datalake_spark.operators.corpus_grain import (
        whitespace_tf_grain,
    )

    ucnt = (
        whitespace_tf_grain(spark, sf_dir)
        .groupBy("w")
        .agg(F.sum("c").alias("n"))
        .localCheckpoint(eager=False)
    )
    stats = ucnt.agg(F.sum("n").alias("tt")).crossJoin(
        bcnt.agg(F.sum("nb").alias("bb"))
    )
    u1 = ucnt.select(F.col("w").alias("w1"), F.col("n").alias("n1"))
    u2 = ucnt.select(F.col("w").alias("w2"), F.col("n").alias("n2"))
    scored = (
        bcnt.filter(F.col("nb") >= _MIN_COLLOC_N)
        .select(
            F.split_part(F.col("b"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("b"), F.lit(" "), F.lit(2)).alias("w2"),
            "nb",
        )
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(stats))
    )
    score = (
        F.col("nb")
        * F.col("tt").cast("double")
        * F.col("tt")
        / (F.col("bb") * F.col("n1") * F.col("n2"))
    )
    return (
        scored.select(
            "w1",
            "w2",
            F.col("nb").cast("long").alias("n_bigram"),
            F.round(F.log(score), 6).alias("pmi"),
            score.alias("_s"),
        )
        .orderBy(F.col("_s").desc(), "w1", "w2")
        .limit(20)
        .drop("_s")
    )


_RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
_RRF_POOL = 50  # candidates taken from each ranker

from sparkify_datalake_spark.operators.similarity import (  # noqa: E402
    _sql_dot,
    _sql_norm,
)

_RRF_COS_SQL = (
    f"{_sql_dot('e.embedding', 't.embedding')} / "
    f"({_sql_norm('e.embedding')} * {_sql_norm('t.embedding')})"
)


@query(
    "sim_hybrid_rrf",
    f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tokens()}) AS token
  FROM documents
),
dl AS (
  SELECT doc_id, len({_sql_tokens()}) AS dl FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM tok WHERE token IN ({_TERMS_SQL})
  GROUP BY doc_id, token
),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
stats AS (
  SELECT count(*) AS n, avg(len({_sql_tokens()})) AS avgdl
  FROM documents
),
lex_scored AS (
  SELECT doc_id,
    round(sum(
      ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
      tf * (1.2 + 1.0) /
      (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    ), 6) AS s
  FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id), stats
  GROUP BY doc_id
  ORDER BY s DESC, doc_id
  LIMIT {_RRF_POOL}
),
lex AS (
  SELECT doc_id,
    row_number() OVER (ORDER BY s DESC, doc_id) AS r
  FROM lex_scored
),
t AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
sem_scored AS (
  SELECT e.vec_id AS doc_id,
    round({_RRF_COS_SQL}, 6) AS s
  FROM embeddings e, t
  WHERE e.vec_id <> 0
  ORDER BY s DESC, doc_id
  LIMIT {_RRF_POOL}
),
sem AS (
  SELECT doc_id,
    row_number() OVER (ORDER BY s DESC, doc_id) AS r
  FROM sem_scored
)
SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
  CAST(lex.r AS BIGINT) AS lex_rank,
  CAST(sem.r AS BIGINT) AS sem_rank,
  round(COALESCE(1.0 / ({_RRF_K} + lex.r), 0)
        + COALESCE(1.0 / ({_RRF_K} + sem.r), 0), 6) AS rrf_score
FROM lex FULL OUTER JOIN sem USING (doc_id)
ORDER BY rrf_score DESC, doc_id
LIMIT 20
""",
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the lexical BM25
    ranking (text_bm25_topk's scorer, fixed term query) and the
    semantic cosine ranking (sim_cosine_topk's probe vector) fused by
    RRF(d) = sum 1/(60 + rank_i(d)) over the rankers that returned d
    — the score-scale-free fusion every hybrid search stack (BM25 +
    dense retriever) ships, robust to BM25's unbounded scores vs
    cosine's [-1,1] precisely because only RANKS enter. Docs carry
    both representations where doc_id = vec_id (the fixture's aligned
    id space); each ranker contributes its top-{_RRF_POOL} pool.

    Scale shape: both rankers are bounded-heap top-k (the ranking
    module's TakeOrderedAndProject discipline) — the only windows run
    on the two {_RRF_POOL}-row pools, and the fusion is a tiny
    full-outer join. Ranks derive from ROUNDED scores with id
    tiebreaks, so rank order (and hence the fused set) is
    engine-deterministic.
    """
    from sparkify_datalake_spark.operators.similarity import (
        _dot,
        _norm,
    )
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    # lexical pool: BM25 over the fixed term query
    doclen = docs.select("doc_id", F.size(_tokens()).alias("dl"))
    tf = _tf(docs)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(_tokens())).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
    )
    lex_scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(idf * F.col("tf") * F.lit(_BM25_K1 + 1.0) / norm), 6
            ).alias("s")
        )
        .orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(_RRF_POOL)
    )
    w = Window.orderBy(F.col("s").desc(), F.col("doc_id"))
    lex = lex_scored.select(
        "doc_id", F.row_number().over(w).alias("lex_r")
    )
    # semantic pool: cosine to the probe vector
    target = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("t_embedding")
    )
    cos = _dot("embedding", "t_embedding") / (
        _norm("embedding") * _norm("t_embedding")
    )
    sem_scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(target))
        .select(
            F.col("vec_id").alias("doc_id"), F.round(cos, 6).alias("s")
        )
        .orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(_RRF_POOL)
    )
    sem = sem_scored.select(
        "doc_id", F.row_number().over(w).alias("sem_r")
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        F.col("lex_r").cast("long").alias("lex_rank"),
        F.col("sem_r").cast("long").alias("sem_rank"),
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("lex_r")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("sem_r")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(20)
