"""Embedding-similarity query plans over the `embeddings` table
(array<float> column, 64-dim). Brute-force cosine top-k is the exact,
oracle-checked baseline; the LSH variant is the scale path (rows-only
check — its hyperplane family has no DuckDB twin; recall vs brute force
is asserted in tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpat_jl_spark.functions import similarity as S
from hpat_jl_spark.registry import register
from hpat_jl_spark.tables import load_table

_DIM = 64
_K = 5
_N_QUERIES = 8

_dot = "list_sum(list_transform(range(1, {d}), i -> {a}[i] * {b}[i]))"


def _cos_sql(a: str, b: str) -> str:
    d = _DIM + 1
    return (
        f"round({_dot.format(d=d, a=a, b=b)} / "
        f"(sqrt({_dot.format(d=d, a=a, b=a)}) * "
        f"sqrt({_dot.format(d=d, a=b, b=b)})), 6)"
    )


_knn_oracle = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, e AS ce FROM v),
scored AS (
  SELECT query_id, neighbor_id, {_cos_sql('qe', 'ce')} AS cosine_sim
  FROM q, c WHERE neighbor_id <> query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id) AS knn_rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, knn_rank
FROM ranked WHERE knn_rank <= {_K}
"""


@register("knn_bruteforce", oracle=_knn_oracle, tags=("similarity",))
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, score every
    candidate partition-locally (codegen'd higher-order functions, no
    Python), per-query rank-limit. The only shuffle is the tiny
    per-query top-k merge."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = S.knn_bruteforce(queries, emb, k=_K)
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").alias("knn_rank")
    )


_NEARDUP_THRESHOLD = 0.9

_neardup_oracle = f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_cos_sql('a.e', 'b.e')} AS cosine_sim
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine_sim FROM scored
WHERE cosine_sim > {_NEARDUP_THRESHOLD}
"""


@register("embedding_neardup", oracle=_neardup_oracle, tags=("similarity", "dedup"))
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, bucketed by label so the
    pair space is bounded (the label plays the role an IVF/LSH bucket
    plays at 100 TB)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.neardup_pairs(
        emb, bucket_col="label", threshold=_NEARDUP_THRESHOLD
    ).select("id_a", "id_b", "cosine_sim")


@register("knn_ivf", oracle=None, tags=("similarity",))
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF cells (KMeans coarse quantizer +
    n_probe nearest cells per query) — the storage-partitionable ANN
    path. Rows-only check; twin-retrieval and recall pinned in
    tests/test_similarity.py."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = S.knn_ivf(
        queries, emb, k=_K, n_centroids=8, n_probe=3, fit_sample=0.25
    )
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").alias("knn_rank")
    )


@register("knn_lsh", oracle=None, tags=("similarity",))
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing — the
    candidate join shuffles on bucket key instead of cross-joining.
    Rows-only driver check; recall vs the exact baseline is asserted in
    tests/test_similarity.py."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    # 3 planes = 8 buckets: the fixture embeddings are near-isotropic
    # noise (top-5 cosine ≈ 0.37), so recall needs generous buckets;
    # clustered real-world embeddings support far more planes.
    out = S.knn_lsh(queries, emb, k=_K, num_planes=3, dim=_DIM)
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").alias("knn_rank")
    )
