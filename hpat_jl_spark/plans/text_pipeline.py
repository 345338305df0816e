"""Text-analysis + dedup query plans over the `documents` table
(extension layer; BASELINE.json north star). Oracle-checked where the
kernel is SQL-expressible; MinHash/SimHash register rows-only (hash
families differ across engines — the driver records the weaker check,
and tests/test_dedup.py pins their semantics with planted duplicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpat_jl_spark.functions import dedup as D
from hpat_jl_spark.functions import text as X
from hpat_jl_spark.registry import register
from hpat_jl_spark.tables import load_table

_STOP_SQL = ", ".join(f"'{w}'" for w in X.STOPWORDS)

_text_stats_oracle = f"""
WITH base AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\\s+') AS toks,
         lower(text) AS lowered,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS normalized
  FROM documents
), stats AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_filter(toks, x -> x IN ({_STOP_SQL})))::DOUBLE / len(toks) AS sw,
         length(regexp_replace(lowered, '[a-z0-9\\s]', '', 'g'))::DOUBLE
           / length(lowered) AS pr,
         md5(normalized) AS fingerprint
  FROM base
)
SELECT doc_id,
       n_tokens,
       round(sw, 4) AS stopword_ratio,
       round(pr, 4) AS punct_ratio,
       round(0.4 * least(sw * 5.0, 1.0) + 0.3 * (1.0 - pr)
             + 0.3 * least(n_tokens / 100.0, 1.0), 4) AS quality,
       CASE WHEN sw > 0.05 THEN 'en' ELSE 'other' END AS lang_guess,
       fingerprint
FROM stats
"""


@register("text_stats", oracle=_text_stats_oracle, tags=("text",))
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, quality scoring, language-ID heuristic and
    fingerprinting in one scan — all built-in-function compositions
    (functions/text.py), zero Python in the plan.

    Tokenization/ratios are materialized ONCE in a staged projection and
    reused — the naive composition re-evaluates split+filter per derived
    column (quality_score alone embeds three tokenizations; Catalyst's
    subexpression elimination doesn't span the lambda functions)."""
    docs = load_table(spark, "documents", sf_dir)
    par = spark.sparkContext.defaultParallelism
    staged = docs.repartition(par).select(
        "doc_id",
        "text",
        X.tokens("text").alias("__toks"),
        F.lower("text").alias("__lowered"),
    )
    ratios = staged.select(
        "doc_id",
        "text",
        F.size("__toks").alias("n_tokens"),
        (
            F.size(F.filter("__toks", X._in_stopwords)).cast("double")
            / F.size("__toks")
        ).alias("__sw"),
        (
            F.length(F.regexp_replace("__lowered", r"[a-z0-9\s]", "")).cast(
                "double"
            )
            / F.length("__lowered")
        ).alias("__pr"),
    )
    quality = (
        0.4 * F.least(F.col("__sw") * 5.0, F.lit(1.0))
        + 0.3 * (1.0 - F.col("__pr"))
        + 0.3 * F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0))
    )
    return ratios.select(
        "doc_id",
        "n_tokens",
        F.round("__sw", 4).alias("stopword_ratio"),
        F.round("__pr", 4).alias("punct_ratio"),
        F.round(quality, 4).alias("quality"),
        F.when(F.col("__sw") > 0.05, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("lang_guess"),
        X.fingerprint("text").alias("fingerprint"),
    )


_dedup_exact_oracle = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
       min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM documents
GROUP BY 1
"""


@register("dedup_exact", oracle=_dedup_exact_oracle, tags=("dedup",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text md5 — one hash aggregate, the
    canonical first pass of any corpus pipeline. At 100 TB this shuffles
    only (16-byte fingerprint, id) pairs, never text."""
    docs = load_table(spark, "documents", sf_dir)
    return D.exact_dedup(docs).select("fingerprint", "keep_id", "n_dups")


_JACCARD_THRESHOLD = 0.3

_ngram_jaccard_oracle = f"""
WITH toks AS (
  SELECT doc_id, lang, source,
         list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS words
  FROM documents
), scored AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(len(list_intersect(a.words, b.words))::DOUBLE
               / len(list_distinct(a.words || b.words)), 4) AS jaccard
  FROM toks a JOIN toks b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard > {_JACCARD_THRESHOLD}
"""


@register("ngram_jaccard", oracle=_ngram_jaccard_oracle, tags=("dedup",))
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard over (lang, source)-bucketed pairs —
    bucketing bounds the pair blow-up (SURVEY §7: never a global cross
    product; at scale the bucket key is an LSH band instead)."""
    docs = load_table(spark, "documents", sf_dir)
    return D.jaccard_pairs(
        docs, ["lang", "source"], threshold=_JACCARD_THRESHOLD
    )


@register("dedup_minhash", oracle=None, tags=("dedup",))
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (shingle → 32 minhashes → 8
    bands → bucket self-join). Rows-only driver check (the xxhash64
    permutation family has no DuckDB twin); semantics pinned by
    tests/test_dedup.py with planted near-duplicates."""
    docs = load_table(spark, "documents", sf_dir)
    out = D.minhash_candidates(docs).filter(F.col("est_jaccard") >= 0.5)
    return out.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.round("est_jaccard", 4).alias("est_jaccard"),
    )


@register("dedup_simhash", oracle=None, tags=("dedup",))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates (64-bit signature, 4×16-bit bands,
    Hamming ≤ 6). Rows-only driver check; semantics pinned in tests."""
    docs = load_table(spark, "documents", sf_dir)
    return D.simhash_candidates(docs).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "hamming",
    )
