"""Embedding similarity-search operators (SURVEY.md §2-I; ANN scale path
per the similarity-search literature referenced in PAPERS.md).

Cosine kernels use higher-order functions (`zip_with`/`aggregate`) —
JVM-side, no Python boundary, exact double arithmetic that DuckDB's
list lambdas reproduce bit-for-bit.

Scale notes (100 TB):
- ``sim_cosine_topk`` broadcasts the (tiny) query side and runs a single
  map + TakeOrderedAndProject (bounded heap) — no shuffle of the corpus;
  this is the right brute-force shape even at scale when the query set is
  small.
- ``sim_threshold_pairs`` self-joins within `label` (IVF-style coarse
  partition); at 100 TB the label is a learned/IVF centroid id so each
  bucket's O(n²) is bounded.
- ``sim_ann_lsh`` is the unbounded-corpus path: random-hyperplane LSH
  buckets (one map + one shuffle), candidates only within the probe's
  bucket.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load

_DIM = 64


def _dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {_DIM + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _sql_norm(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


@query(
    "embed_norm",
    f"""
SELECT vec_id, label,
  round({_sql_norm('embedding')}, 6) AS l2_norm,
  round(CAST(embedding[1] AS DOUBLE) / {_sql_norm('embedding')}, 6)
    AS first_normalized
FROM embeddings
""",
)
def embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm per vector + first component of the normalized vector."""
    emb = load(spark, sf_dir, "embeddings")
    nrm = _norm("embedding")
    return emb.select(
        "vec_id",
        "label",
        F.round(nrm, 6).alias("l2_norm"),
        F.round(F.element_at("embedding", 1).cast("double") / nrm, 6).alias(
            "first_normalized"
        ),
    )


_COS_SQL = (
    f"{_sql_dot('t.embedding', 'e.embedding')} / "
    f"({_sql_norm('t.embedding')} * {_sql_norm('e.embedding')})"
)


@query(
    "sim_cosine_topk",
    f"""
WITH t AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, round({_COS_SQL}, 6) AS cos_sim
FROM embeddings e, t
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id
LIMIT 10
""",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0.

    Orders by the *rounded* similarity with vec_id tiebreak so the top-k
    set is engine-deterministic even when unrounded values differ at
    1e-16.
    """
    emb = load(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("t_embedding")
    )
    cos = _dot("embedding", "t_embedding") / (
        _norm("embedding") * _norm("t_embedding")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(target))
        .select("vec_id", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


_PAIR_COS_SQL = (
    f"{_sql_dot('a.embedding', 'b.embedding')} / "
    f"({_sql_norm('a.embedding')} * {_sql_norm('b.embedding')})"
)


@query(
    "sim_threshold_pairs",
    f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
  round({_PAIR_COS_SQL}, 6) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({_PAIR_COS_SQL}, 6) > 0.3
""",
)
def sim_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-label pairs above a cosine threshold (IVF-bucketed shape).

    One applyInPandas group per label: the group's vectors become an
    N×64 float64 matrix, rows are L2-normalized, and the pair cosines
    are one BLAS matmul (X @ X.T). This is the blocked-GEMM shape you
    run at 100 TB (label = IVF centroid id bounds each block's O(n²)),
    and it replaces a JVM formulation that evaluated ~190 interpreted
    array-lambda calls per pair (measured 124 s at sf0.1 → ~2 s).
    """
    import numpy as np
    import pandas as pd

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt((x * x).sum(axis=1))
        sims = (x @ x.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        # vec_id order, not matrix order: a < b by id like the oracle
        a, b = np.minimum(ids[iu], ids[ju]), np.maximum(ids[iu], ids[ju])
        cos = np.round(sims[iu, ju], 6)
        keep = cos > 0.3
        return pd.DataFrame(
            {
                "vec_a": a[keep],
                "vec_b": b[keep],
                "label": pdf["label"].iloc[0],
                "cos_sim": cos[keep],
            }
        )

    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", "label", "embedding")
        .groupBy("label")
        .applyInPandas(
            pairs, "vec_a long, vec_b long, label int, cos_sim double"
        )
    )


def _hyperplanes(n_planes: int = 4, dim: int = _DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixture-independent seed)."""
    rng = random.Random(20240813)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


@query("sim_ann_lsh")
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 for vec_id=0 via random-hyperplane LSH with multi-probe.

    Each vector gets a 4-bit signature (sign of dot with 4 fixed
    hyperplanes); the probe scans its own bucket plus all buckets at
    hamming distance 1 (multi-probe LSH), then ranks candidates by exact
    cosine. Rows-only: recall is probabilistic by design — the
    brute-force twin (sim_cosine_topk) is the hash-checked anchor.
    """
    emb = load(spark, sf_dir, "embeddings")
    bucket = F.lit(0)
    n_planes = len(_hyperplanes())
    for p, plane in enumerate(_hyperplanes()):
        plane_col = F.array(*[F.lit(v) for v in plane])
        bit = (_dot("embedding", plane_col) > 0).cast("int")
        bucket = bucket + F.shiftleft(bit, p)
    bucketed = emb.select("vec_id", "embedding", bucket.alias("bucket"))
    # Multi-probe: the target row fans out to its bucket + the n one-bit
    # flips, then a broadcast equi-join picks up all candidate vectors.
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << p))
            for p in range(n_planes)
        ],
    )
    target = (
        bucketed.filter(F.col("vec_id") == 0)
        .select(
            F.col("embedding").alias("t_embedding"),
            F.explode(probes).alias("t_bucket"),
        )
    )
    cos = _dot("embedding", "t_embedding") / (
        _norm("embedding") * _norm("t_embedding")
    )
    return (
        bucketed.filter(F.col("vec_id") != 0)
        .join(F.broadcast(target), F.col("bucket") == F.col("t_bucket"))
        .select("vec_id", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


_EMBED_DUP_TAU = 0.4


@query(
    "dedup_embed",
    f"""
SELECT a.vec_id, min(b.vec_id) AS survivor_id
FROM embeddings a JOIN embeddings b
  ON a.label = b.label
  AND round({_PAIR_COS_SQL}, 6) >= {_EMBED_DUP_TAU}
GROUP BY a.vec_id
""",
)
def dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup survivors: vec_id → min similar vec_id.

    Dedup shape, not pair shape: each vector maps to the smallest vec_id
    among its cosine-neighbors within its label block (itself included —
    cos(v,v)=1 — so singletons survive as themselves). τ is calibrated
    to the synthetic corpus (within-label cosines top out ≈0.5); on a
    real corpus this is ≥0.95. Same blocked-GEMM kernel as
    sim_threshold_pairs: one float64 matmul per label block via
    applyInPandas, O(block²) bounded by the IVF/label blocking.
    """
    import numpy as np
    import pandas as pd

    def survivors(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt((x * x).sum(axis=1))
        sims = np.round((x @ x.T) / np.outer(norms, norms), 6)
        neigh = sims >= _EMBED_DUP_TAU
        # min vec_id over each row's neighbor set (diagonal is 1.0 ≥ τ)
        out = [ids[mask].min() for mask in neigh]
        return pd.DataFrame({"vec_id": ids, "survivor_id": out})

    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", "label", "embedding")
        .groupBy("label")
        .applyInPandas(survivors, "vec_id long, survivor_id long")
    )


_IVF_K = 8
# 2 Lloyd's iterations: at k=8 the quantizer converges almost immediately
# and each extra iteration is a full corpus pass + centroid collect cycle
# (the recall test pins quality). A real deployment trains once offline
# and persists the centroids; queries() is stateless so training runs
# per call here.
_IVF_ITERS = 2
_IVF_NPROBE = 3


def _kmeans_centroids(spark: SparkSession, sf_dir: str):
    """Lloyd's k-means coarse quantizer — the IVF training step.

    The MLlib topology: centroids (k×64 floats — bytes, not data) live on
    the driver and ship into each iteration's Arrow kernel closure; the
    assignment pass is distributed (one mapInPandas over the corpus), and
    the centroid update is one small groupBy. Deterministic: init =
    vectors with vec_id 0..k-1, fixed iteration count, float64 math.
    """
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = np.stack(
        [
            np.array(r["embedding"], dtype=np.float64)
            for r in emb.filter(F.col("vec_id") < _IVF_K)
            .orderBy("vec_id")
            .collect()
        ]
    )
    for _ in range(_IVF_ITERS):
        c = cent  # bind for closure

        def assign(batches):
            for pdf in batches:
                x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "cluster": d.argmin(axis=1).astype("int32"),
                        "embedding": pdf["embedding"],
                    }
                )

        assigned = emb.mapInPandas(
            assign, "vec_id long, cluster int, embedding array<float>"
        )
        # centroid update: per-dimension mean via one small groupBy
        sums = (
            assigned.select(
                "cluster", F.posexplode("embedding").alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = cent.copy()
        for r in sums:
            new[r["cluster"], r["dim"]] = r["m"]
        cent = new
    return cent


@query("sim_ivf_topk")
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 for vec_id=0 via IVF: k-means buckets + nprobe search.

    The inverted-file scale path the LSH variant complements: train a
    k=8 coarse quantizer, assign every vector to its nearest centroid,
    then search only the nprobe=3 centroid lists nearest the query —
    at 100 TB the assignment is a partitioning column, so a probe scans
    nprobe/k of the corpus (partition pruning does the skipping).
    Rows-only: recall is probabilistic by design; tests assert overlap
    with the brute-force twin (sim_cosine_topk) on the fixtures.
    """
    import numpy as np
    import pandas as pd

    cent = _kmeans_centroids(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = np.array(
        emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"],
        dtype=np.float64,
    )
    probe = np.argsort(((cent - q) ** 2).sum(axis=1))[:_IVF_NPROBE]
    probe_set = {int(p) for p in probe}
    c = cent

    def in_probed(batches):
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            cl = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(
                axis=1
            )
            mask = np.isin(cl, list(probe_set)) & (pdf["vec_id"].to_numpy() != 0)
            xs = x[mask]
            if len(xs) == 0:
                yield pd.DataFrame({"vec_id": [], "cos_sim": []})
                continue
            sims = (xs @ q) / (
                np.sqrt((xs * xs).sum(axis=1)) * np.sqrt((q * q).sum())
            )
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[mask],
                    "cos_sim": np.round(sims, 6),
                }
            )

    return (
        emb.mapInPandas(in_probed, "vec_id long, cos_sim double")
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )
