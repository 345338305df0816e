"""BPE tokenizer TRAINING and encoding — the missing half of the token
layer (token_count_bpe counts with a fixed regex; this learns the
subword vocabulary itself, Sennrich et al. 2016).

Scale shape — the one real tokenizer trainers (subword-nmt, HF
tokenizers) use, which is exactly this repo's bounded-vocab pattern:

1. DISTRIBUTED word count: one partial-agg shuffle over the corpus —
   the only pass that touches all data. BPE statistics depend only on
   the (word, freq) table, never on raw text again.
2. Cap to the top `max_words` by (freq desc, word): TakeOrdered, a
   bounded driver collect (same contract as the IVF fit sample and the
   encode vocabulary).
3. Driver-side merge loop over the bounded vocab (pure python,
   O(V·avg_len) per merge): repeatedly merge the most frequent adjacent
   symbol pair; ties break lexicographically so training is
   deterministic — no RNG anywhere.
4. Encode: the learned merge list broadcasts (a few KB) into an
   Arrow-batched kernel; per-word results memoize within a batch, so
   the Zipf head costs one merge-application per distinct word.

At 100 TB steps 1 and 4 are the distributed work and scale like any
word count / map stage; step 3 is bounded by `max_words`, not by the
corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END = "</w>"


def bpe_merges_from_word_counts(
    word_counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, freq) vocabulary:
    words start as character sequences + end-of-word marker; each round
    merges the globally most frequent adjacent pair (ties: lexicographic
    smallest pair — deterministic). Returns merges in learned order."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(word) + (END,): freq for word, freq in word_counts if word
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a learned merge table: repeatedly apply the
    LOWEST-rank applicable merge (the standard BPE encode order)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 64,
    max_words: int = 65536,
) -> list[tuple[str, str]]:
    """Learn BPE merges from a corpus: distributed word count →
    bounded top-`max_words` collect → driver merge loop (see module
    doc for why this shape is the scalable one)."""
    counts = (
        docs.select(F.explode(F.split(F.trim(text_col), r"\s+")).alias("w"))
        # split('') yields [''] for empty/whitespace-only docs; drop it
        # BEFORE the vocab cap so both engines cap the same vocabulary
        # (the DuckDB training oracle filters w <> '' pre-QUALIFY — an
        # empty doc plus >= max_words distinct words would otherwise
        # displace the last real word on the Spark side only, ADVICE r05).
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_words)
        .collect()
    )
    return bpe_merges_from_word_counts(
        [(r.w, r.c) for r in counts], num_merges
    )


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode every document with the learned merges (Arrow kernel,
    per-batch word memoization) and report the per-doc subword count
    next to the whitespace word count — the compression the tokenizer
    buys. Output: (doc_id, n_words, n_subwords)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            n_words, n_sub = [], []
            for txt in pdf[text_col]:
                # NULL text must count as the empty document (0 words),
                # matching the oracle's left join → 0, not the literal
                # word "None" (ADVICE r08).
                words = ("" if pd.isna(txt) else str(txt)).strip().split()
                total = 0
                for w in words:
                    n = memo.get(w)
                    if n is None:
                        n = len(apply_merges(w, ranks))
                        memo[w] = n
                    total += n
                n_words.append(len(words))
                n_sub.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_words": pd.array(n_words, dtype="int64"),
                    "n_subwords": pd.array(n_sub, dtype="int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel, "doc_id long, n_words long, n_subwords long"
    )
