"""Text-analysis kernels over a string column: normalization, token
counting, quality scoring, language-ID heuristic, fingerprinting.

No reference parity here — HPAT.jl has NO string functions at all
(SURVEY §2.7: strings are integer-coded); this is the extension layer.
Everything is built-in-function compositions (split / regexp / md5 /
higher-order array functions), so the hot path stays in whole-stage
codegen — no Python UDFs anywhere in text analysis.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed stopword list (deterministic; mirrors the oracle SQL).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def normalize_text(col: Column | str) -> Column:
    """lower + collapse runs of whitespace to single spaces + trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are stopwords (quality signal)."""
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, _in_stopwords))
    return n_stop.cast("double") / F.size(toks)


def _in_stopwords(x: Column) -> Column:
    out = F.lit(False)
    for w in STOPWORDS:
        out = out | (x == w)
    return out


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not [a-z0-9\\s] (on the lowered
    text) — high values signal boilerplate/markup."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    n_punct = F.length(F.regexp_replace(c, r"[a-z0-9\s]", ""))
    return n_punct.cast("double") / F.length(c)


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: stopword presence (fluency),
    low punctuation noise, and length saturation at 100 tokens."""
    sw = stopword_ratio(col)
    pr = punct_ratio(col)
    length_sat = F.least(token_count(col).cast("double") / 100.0, F.lit(1.0))
    return 0.4 * F.least(sw * 5.0, F.lit(1.0)) + 0.3 * (1.0 - pr) + 0.3 * length_sat


def lang_guess(col: Column | str) -> Column:
    """N-gram-free language-ID heuristic: English stopword density.
    (Deterministic placeholder classifier — fixture text is synthetic
    word salad; the plumbing, not the model, is the deliverable.)"""
    return F.when(stopword_ratio(col) > 0.05, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text. Used as the
    exact-dedup key; 128-bit so collision-safe at 100 TB corpus sizes."""
    return F.md5(normalize_text(col))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles → array<string> (input to MinHash/Jaccard).
    Built with higher-order functions (sequence/transform/slice), fully
    JVM-side."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 50,
    stride: int = 25,
) -> DataFrame:
    """Split documents into overlapping token windows — the
    tokenize-and-chunk step that turns a cleaned corpus into training
    rows. One chunk per (doc, start): tokens [start, start+chunk_size),
    starts every ``stride`` tokens, short docs yield one chunk.

    Output: (doc_id, chunk_start, n_chunk_tokens, chunk_hash) — the
    hash (md5 of the reassembled window) stands in for chunk text so
    the result stays narrow; a materializing pipeline would keep the
    text column instead.

    Scale shape: all JVM-side — tokenize once, explode the start
    sequence (a few ints per doc, NOT per-token rows), slice the token
    array per chunk. The explode multiplies rows by ~n_tokens/stride
    but each row carries only the doc's token array reference until the
    projection, and the output shuffles nothing (pure map stage).
    """
    toks = tokens(text_col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - (chunk_size - 1), F.lit(1)),
        F.lit(stride),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_start"), chunk_size)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("__toks"),
            F.explode(starts).alias("chunk_start"),
        )
        .select(
            "doc_id",
            "chunk_start",
            F.size(chunk).alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
    )
