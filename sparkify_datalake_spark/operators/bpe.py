"""Subword tokenizer: train-and-apply byte-pair encoding (BPE).

The one text-stack capability a real LLM-data pipeline has that plain
token counting lacks: a LEARNED subword vocabulary (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public knowledge; same family as GPT-2's byte-level BPE and
sentencepiece's BPE mode).

Split of labor, following the IVF-centroid discipline (driver-held
KB-sized model, distributed application):

1. FIT — distributed word-frequency rollup over a deterministic
   hash-sampled corpus slice. The classic insight that makes BPE
   training cheap: the merge loop operates on the WORD-TYPE frequency
   table (vocabulary-sized, ~10⁴–10⁶ rows at any corpus size), never
   on running text — so Spark reduces the corpus to that table (one
   partial-aggregated shuffle) and the driver runs the merge loop on a
   top-V slice of it. Driver cost is O(V · merges), independent of
   corpus bytes; the learned merge table is a few KB.
2. APPLY — the merge-rank table enters a self-contained mapInPandas
   closure (Arrow batches; workers import no repo modules) that
   greedily encodes each document with per-batch word→tokens
   memoization (vocabulary repeats make this ~O(distinct words), not
   O(tokens)). Embarrassingly parallel, no shuffle besides the final
   vocabulary-sized rollup — the 100 TB shape.

Determinism (rows-only query class): every step is exact — xxhash64
sampling, integer counts with (count DESC, word) total-order
tie-breaks, lexicographically-smallest-pair merge tie-break, and
greedy lowest-rank-first encoding — so reruns are byte-identical, and
tests/test_bpe.py pins the whole pipeline against an INDEPENDENT
pure-Python reimplementation at sf0.001 plus round-trip / token-count
invariants.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load

# End-of-word marker appended to every word before merging — makes
# word-final subwords ("ing</w>") distinct from word-internal ones
# ("ing"), exactly as in the original BPE formulation.
WORD_END = "</w>"

# Model hyperparameters: pinned so the learned vocabulary (and hence
# the rows-only output) is stable round to round.
N_MERGES = 200
VOCAB_CAP = 4000  # top word types fed to the merge loop
SAMPLE_MOD = 5  # fit on the xxhash64(doc_id) % 5 == 0 slice (~20%)


def fit_bpe_merges(
    word_freqs: list[tuple[str, int]], n_merges: int = N_MERGES
) -> list[tuple[str, str]]:
    """Learn a BPE merge list from a word-type frequency table.

    Pure driver-side Python (the table is vocabulary-sized). Each
    iteration merges the most frequent adjacent symbol pair across the
    weighted vocabulary; ties break to the lexicographically smallest
    pair so the result is a pure function of the input table.
    """
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_freqs:
        sym = tuple(w) + (WORD_END,)
        vocab[sym] = vocab.get(sym, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_n)
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


@query("text_bpe_tokenize")
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE subword vocabulary on a corpus slice, apply it to
    every document, and report the top-40 subword tokens by occurrence
    (with document frequency and a word-final flag).

    Rows-only by design: DuckDB has no iterative-merge surface, so
    there is no SQL oracle — correctness rests on the independent
    pure-Python twin + invariants in tests/test_bpe.py and the
    registry-wide rerun-stability guard.

    Scale shape: fit touches the corpus once (hash-sampled slice →
    one partial-aggregated word-count shuffle → top-V collect of a
    vocabulary-sized table); apply is one mapInPandas pass with the
    KB-sized merge table shipped in the closure; the finisher is a
    token-grain rollup + bounded top-40. No step's driver or shuffle
    footprint grows with corpus bytes except the token rollup, which
    is sub-vocabulary-sized.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    # -- FIT: distributed word counts on the deterministic slice ------
    slice_docs = docs.filter(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(SAMPLE_MOD)) == 0
    )
    wf_rows = (
        slice_docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(VOCAB_CAP)
        .collect()
    )
    merges = fit_bpe_merges([(r["w"], r["c"]) for r in wf_rows])
    ranks = {pair: i for i, pair in enumerate(merges)}

    # -- APPLY: self-contained Arrow kernel (no repo imports on
    # workers); emits per-doc aggregated (token, n) pairs so the
    # downstream shuffle carries per-doc distinct tokens, not tokens --
    def kernel(batches):
        import pandas as pd

        word_end = "</w>"
        cache: dict[str, tuple[str, ...]] = {}

        def encode(word: str) -> tuple[str, ...]:
            hit = cache.get(word)
            if hit is not None:
                return hit
            sym = list(word) + [word_end]
            while len(sym) > 1:
                best_rank = None
                best_pair = None
                for i in range(len(sym) - 1):
                    r = ranks.get((sym[i], sym[i + 1]))
                    if r is not None and (
                        best_rank is None or r < best_rank
                    ):
                        best_rank, best_pair = r, (sym[i], sym[i + 1])
                if best_pair is None:
                    break
                a, b = best_pair
                out, i = [], 0
                while i < len(sym):
                    if (
                        i + 1 < len(sym)
                        and sym[i] == a
                        and sym[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            res = tuple(sym)
            cache[word] = res
            return res

        from collections import Counter as C

        for pdf in batches:
            toks: list[str] = []
            ns: list[int] = []
            docs_n: list[int] = []
            for text in pdf["text"].fillna(""):
                cnt: C = C()
                for w in text.lower().split(" "):
                    if w:
                        cnt.update(encode(w))
                for t, n in cnt.items():
                    toks.append(t)
                    ns.append(n)
                    docs_n.append(1)
            yield pd.DataFrame(
                {"token": toks, "n": ns, "d": docs_n}
            )

    per_doc = docs.mapInPandas(kernel, "token string, n long, d long")
    return (
        per_doc.groupBy("token")
        .agg(
            F.sum("n").alias("n_occ"),
            F.sum("d").alias("n_docs"),
        )
        .orderBy(F.desc("n_occ"), "token")
        .limit(40)
        .select(
            "token",
            "n_occ",
            "n_docs",
            F.col("token").endswith(WORD_END).alias("word_final"),
        )
    )
