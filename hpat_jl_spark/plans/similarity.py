"""Embedding-similarity query plans over the `embeddings` table
(array<float> column, 64-dim). Brute-force cosine top-k is the exact,
oracle-checked baseline; the LSH variant is the scale path, and since
round 4 it is ALSO fully oracle-gated — its hyperplane family is
portable integer arithmetic (functions/similarity.portable_plane_weights)
that DuckDB replays exactly, so the candidate set and ranking are
value-hash-checked, with recall vs brute force additionally asserted in
tests/test_similarity.py.
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


# SemDeDup-shaped transitive clusters over the SAME pair CTE as the
# embedding_neardup oracle, closed with the recursive-CTE min-label
# fixpoint (the graph.py / dedup_cluster pattern). 40 rounds >> the
# diameter of cosine-0.9 near-dup clusters.
_emb_cluster_oracle = f"""
WITH RECURSIVE
v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
strong AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {_cos_sql('a.e', 'b.e')} > {_NEARDUP_THRESHOLD}
),
verts AS (SELECT id_a AS vertex FROM strong UNION SELECT id_b FROM strong),
aug AS (
  SELECT id_a AS src, id_b AS dst FROM strong
  UNION ALL SELECT id_b, id_a FROM strong
  UNION ALL SELECT vertex, vertex FROM verts
),
cc(iter, vertex, comp) AS (
  SELECT 0, vertex, vertex FROM verts
  UNION ALL
  SELECT c.iter + 1, a.dst, min(c.comp)
  FROM cc c JOIN aug a ON a.src = c.vertex
  WHERE c.iter < 40
  GROUP BY c.iter + 1, a.dst
)
SELECT comp AS canonical_id,
       count(*)::BIGINT AS cluster_size
FROM cc WHERE iter = 40
GROUP BY comp
"""


@register(
    "embedding_dedup_clusters",
    oracle=_emb_cluster_oracle,
    tags=("similarity", "dedup", "iterative"),
)
def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) shape: embedding-cosine near-dup
    pairs within a bucket → transitive closure → keep ONE canonical
    per semantic cluster (min id) — the embedding-space twin of
    dedup_cluster's shingle-space clustering. Cluster membership
    includes every vertex touched by a pair (size ≥ 2 by construction).

    Scale: pairs come from the bucketed gram kernel (never all-pairs);
    the CC iterates over the pair EDGES only (operators/iterative —
    localCheckpoint per round); the summary is one aggregate. Fully
    oracle-gated: pair set + recursive-CTE fixpoint replayed in DuckDB."""
    from hpat_jl_spark.operators.iterative import connected_components

    emb = load_table(spark, "embeddings", sf_dir)
    pairs = S.neardup_pairs(
        emb, bucket_col="label", threshold=_NEARDUP_THRESHOLD
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.groupBy(F.col("component").alias("canonical_id")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )


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


# knn_lsh oracle: replay the PORTABLE bucket function (integer-quantized
# components × md5-derived integer plane weights — functions/similarity.
# lsh_bucket_sql inlines the same literals lsh_bucket_expr compiles), so
# DuckDB reproduces the candidate set EXACTLY, then scores/ranks it with
# the same cosine arithmetic as the brute-force oracle. This upgraded
# knn_lsh from rows-only (r1-r3: gaussian planes from a numpy RNG no
# other engine could replay) to a full value-hash gate.
_LSH_PLANES = 3
_lsh_bucket = S.lsh_bucket_sql("e", S.portable_plane_weights(_DIM, _LSH_PLANES))

_knn_lsh_oracle = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
b AS (SELECT vec_id, e, {_lsh_bucket} AS bucket FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM b
      WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id, {_cos_sql('qe', 'c.e')} AS cosine_sim
  FROM q JOIN b c USING (bucket) WHERE c.vec_id <> query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id) AS knn_rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, knn_rank
FROM ranked WHERE knn_rank <= {_K}
"""


@register("knn_lsh", oracle=_knn_lsh_oracle, tags=("similarity",))
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing — the
    candidate join shuffles on bucket key instead of cross-joining.
    Fully oracle-gated since round 4: the bucket function is exact
    integer arithmetic both engines compute identically (see
    functions/similarity.lsh_buckets), so the oracle replays candidate
    generation AND ranking; recall vs the exact baseline is additionally
    asserted in tests/test_similarity.py."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    # 3 planes = 8 buckets: the fixture embeddings are near-isotropic
    # noise (top-5 cosine ≈ 0.37), so recall needs generous buckets;
    # clustered real-world embeddings support far more planes.
    out = S.knn_lsh(queries, emb, k=_K, num_planes=3, dim=_DIM)
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").alias("knn_rank")
    )


_centroid_oracle = """
WITH ex AS (
  SELECT label, vec_id, unnest(embedding)::DOUBLE AS val,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings),
cent AS (SELECT label, pos, avg(val) AS cval FROM ex GROUP BY 1, 2),
cnorm AS (SELECT label, sqrt(sum(cval * cval)) AS cn FROM cent GROUP BY 1),
pv AS (SELECT e.label, e.vec_id, sum(e.val * c.cval) AS dot,
              sqrt(sum(e.val * e.val)) AS vn
       FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
       GROUP BY 1, 2)
SELECT pv.label, count(*)::BIGINT AS n_vecs,
       round(max(cn), 6) AS centroid_norm,
       round(avg(dot / (vn * cn)), 6) AS mean_cos_to_centroid
FROM pv JOIN cnorm ON pv.label = cnorm.label
GROUP BY pv.label
"""


@register("embedding_centroids", oracle=_centroid_oracle, tags=("similarity",))
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed per-label centroid + intra-class cohesion (mean
    cosine of members to their centroid) — the embedding-quality probe
    run before training on a corpus.

    Scale shape: posexplode to (label, vec_id, pos, val) — 64× the rows
    but only 4 narrow columns — then per-(label, pos) partial+final avg
    gives the centroid WITHOUT collecting vectors to the driver; the
    member-to-centroid dot products are a (label, pos) equi-join (the
    centroid side is dims × labels rows — broadcast), re-aggregated per
    vector. Everything is JVM-side hash aggregation; no Python, no
    driver matmul, no per-vector UDF."""
    emb = load_table(spark, "embeddings", sf_dir)
    ex = emb.select(
        "label", "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    cent = ex.groupBy("label", "pos").agg(F.avg("val").alias("cval"))
    cnorm = cent.groupBy(F.col("label").alias("cl")).agg(
        F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cn")
    )
    pv = (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum(F.col("val") * F.col("cval")).alias("dot"),
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vn"),
        )
    )
    return (
        pv.join(F.broadcast(cnorm), pv.label == F.col("cl"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.max("cn"), 6).alias("centroid_norm"),
            F.round(
                F.avg(F.col("dot") / (F.col("vn") * F.col("cn"))), 6
            ).alias("mean_cos_to_centroid"),
        )
    )


@register("knn_pq", oracle=None, tags=("similarity",))
def knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via product quantization + ADC with exact
    re-rank (FAISS IVF-PQ's compression half): corpus-wide scoring
    reads 16 one-byte codes per vector instead of 256 bytes of floats,
    then the exact kernel re-scores only the k·rerank shortlist.
    Rows-only driver check; zero-quantization-error golden, recall
    (≥0.9 on noise embeddings) and determinism pinned in
    tests/test_similarity.py."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = S.knn_pq(
        queries, emb, k=_K, n_subspaces=16, n_codes=16, rerank=4,
        fit_sample=0.25,
    )
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").alias("knn_rank")
    )


_scale_report_oracle = """
WITH ex AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS val,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings),
st AS (SELECT dim, avg(val) AS m, stddev_pop(val) AS s,
              count(*) AS n FROM ex GROUP BY 1)
SELECT st.dim::BIGINT AS dim,
       round(st.m, 6) AS dim_mean,
       round(st.s, 6) AS dim_std,
       sum(CASE WHEN abs((ex.val - st.m) / st.s) > 3 THEN 1 ELSE 0 END)::BIGINT
         AS n_outliers
FROM ex JOIN st USING (dim)
GROUP BY st.dim, st.m, st.s
"""


@register("embedding_scale_report", oracle=_scale_report_oracle, tags=("similarity",))
def embedding_scale_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension feature-scaling report (mean, population std,
    |z|>3 outlier count) — the screening pass that decides whether an
    embedding corpus needs normalization before training, and the
    oracle twin of functions/similarity.zscore_normalize (which rewrites
    the vectors with the same stats via a broadcast one-row zip_with).

    Scale shape: posexplode to (dim, val) — narrow rows — then ONE
    per-dim partial+final aggregate (shuffle = d rows per map partition
    after combine); the outlier pass re-scans and joins the d-row stats
    table back by broadcast, so nothing but the tiny stats table ever
    moves. At 100 TB both passes are map-side scans; no vector is ever
    collected."""
    emb = load_table(spark, "embeddings", sf_dir)
    ex = emb.select(F.posexplode("embedding").alias("dim", "val")).withColumn(
        "val", F.col("val").cast("double")
    )
    st = ex.groupBy("dim").agg(
        F.avg("val").alias("m"), F.stddev_pop("val").alias("s")
    )
    return (
        ex.join(F.broadcast(st), "dim")
        .groupBy("dim", "m", "s")
        .agg(
            F.sum(
                (F.abs((F.col("val") - F.col("m")) / F.col("s")) > 3).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            F.round("m", 6).alias("dim_mean"),
            F.round("s", 6).alias("dim_std"),
            "n_outliers",
        )
    )
