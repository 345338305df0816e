"""BPE training/encoding semantics on planted vocabularies where the
merge sequence is known from the literature (Sennrich et al. 2016
worked example), plus encode invariants on the fixture queries."""

from __future__ import annotations

from hpat_jl_spark.functions.bpe import (
    apply_merges,
    bpe_merges_from_word_counts,
)


def test_sennrich_worked_example_merge_order():
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_merges_from_word_counts(counts, 5)
    assert merges == [
        ("e", "s"),      # 6 + 3 = 9
        ("es", "t"),     # 9
        ("est", "</w>"),  # 9
        ("l", "o"),      # 5 + 2 = 7
        ("lo", "w"),     # 7
    ]


def test_tie_breaks_are_lexicographic_and_deterministic():
    # 'ab' and 'cd' pairs both occur twice; ('a','b') < ('c','d')
    counts = [("ab", 2), ("cd", 2)]
    m1 = bpe_merges_from_word_counts(counts, 1)
    m2 = bpe_merges_from_word_counts(list(reversed(counts)), 1)
    assert m1 == m2 == [("a", "b")]


def test_apply_merges_uses_rank_priority():
    # encode must apply LOWER-rank merges first: with ranks
    # (e,s)<(es,t)<(est,</w>), 'newest' collapses the suffix fully
    merges = bpe_merges_from_word_counts(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 5
    )
    ranks = {p: i for i, p in enumerate(merges)}
    assert apply_merges("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert apply_merges("lowest", ranks) == ["low", "est</w>"]
    # unseen characters survive as singletons
    assert apply_merges("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_train_and_encode_on_spark(spark):
    from hpat_jl_spark.functions.bpe import bpe_encode_stats, train_bpe

    docs = spark.createDataFrame(
        [(1, "low low low low low lower lower"),
         (2, "newest newest newest newest newest newest"),
         (3, "widest widest widest")],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, num_merges=5, max_words=100)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    out = {r.doc_id: (r.n_words, r.n_subwords)
           for r in bpe_encode_stats(docs, merges).collect()}
    # 'low' -> ['low','</w>']? no: merges learned: es,est,est</w>,l o,lo w
    # 'low' -> ['low', '</w>'] via (l,o)+(lo,w); '</w>' unmerged with low
    assert out[1][0] == 7
    assert out[2] == (6, 6 * len(apply_merges("newest", {p: i for i, p in enumerate(merges)})))
    # every word is at least one subword
    assert all(ns >= nw for nw, ns in out.values())


def test_fixed_merge_encode_matches_python_reference(spark):
    """bpe_encode_fixed's chained-replace encoding must equal a direct
    Python BPE application of the same frozen merge table (leftmost
    non-overlapping, rank order, </w> word markers)."""
    import re

    from pyspark.sql import functions as F

    from hpat_jl_spark import registry
    from hpat_jl_spark.plans.text_pipeline import _BPE_FIXED_MERGES
    from hpat_jl_spark.tables import load_table

    registry.load_all_plans()
    sf = "/root/testdata/sf0.001"

    def encode_py(text):
        norm = re.sub(" +", " ", re.sub("[^a-z ]", "", text.lower()).strip())
        if not norm:
            return None
        syms = []
        for word in norm.split(" "):
            syms.extend(list(word) + ["</w>"])
        s = " " + " ".join(syms) + " "
        for l, r in _BPE_FIXED_MERGES:
            s = s.replace(f" {l} {r} ", f" {l}{r} ")
        return s.split()

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, "documents", sf).select("doc_id", "text").collect()
    }
    out = registry.REGISTRY["bpe_encode_fixed"].fn(spark, sf).collect()
    assert len(out) > 0
    for r in out:
        ref = encode_py(docs[r.doc_id])
        assert r.n_symbols == len(ref), (r.doc_id, r.n_symbols, len(ref))
        assert r.n_bare_markers == sum(1 for x in ref if x == "</w>")
        assert r.n_merged_symbols == sum(
            1 for x in ref if len(x) > 1 and x != "</w>"
        )


def _rank_order_sequential(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """The oracle's semantics (plans/text_pipeline._bpe_encode_stats_
    oracle): apply each merge ONCE in rank order, symbol-level greedy
    leftmost non-overlapping — the training replay's s{r}->s{r+1} step."""
    from hpat_jl_spark.functions.bpe import END

    syms = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_priority_encode_equals_rank_order_for_self_trained_merges():
    """The equivalence the r8 bpe_encode_stats oracle rests on: for a
    SELF-trained merge list (each merge's components created only by
    earlier merges), priority-order encoding == one-pass-per-merge
    rank-order application. Randomized over seeded synthetic corpora,
    including words with overlapping same-pair runs."""
    import random

    from hpat_jl_spark.functions.bpe import (
        apply_merges,
        bpe_merges_from_word_counts,
    )

    rng = random.Random(8)
    for trial in range(20):
        alphabet = "abcd"[: rng.randint(2, 4)]
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(3, 30))
        ]
        counts = {}
        for w in words:
            counts[w] = counts.get(w, 0) + rng.randint(1, 5)
        merges = bpe_merges_from_word_counts(
            sorted(counts.items()), num_merges=rng.randint(1, 16)
        )
        ranks = {p: i for i, p in enumerate(merges)}
        for w in set(words) | {"aaaa", "abab", "aabbaabb"}:
            w = "".join(c for c in w if c in alphabet) or alphabet[0]
            assert apply_merges(w, ranks) == _rank_order_sequential(w, merges), (
                trial, w, merges
            )


def test_chained_string_replace_diverges_on_same_pair_runs():
    """The documented divergence that kept bpe_encode_stats rows-only
    through r7: the space-delimited chained STRING replace (the
    bpe_encode_trained / bpe_encode_fixed semantics, ' a b ' -> ' ab ')
    skips alternate occurrences in an overlapping same-pair run because
    consecutive matches share their delimiter space. Pinned as a golden
    so the two checked semantics stay deliberately distinct."""
    from hpat_jl_spark.functions.bpe import END, apply_merges

    merges = [("a", "b")]
    word = "abab"
    # priority / rank-order: both (a,b) occurrences merge
    assert apply_merges(word, {("a", "b"): 0}) == ["ab", "ab", END]
    # chained string replace: ' a b a b </w> ' -> first match consumes
    # the shared middle space, second occurrence loses its leading
    # delimiter and survives unmerged
    s = " " + " ".join(list(word) + [END]) + " "
    out = s.replace(" a b ", " ab ")
    assert out == " ab a b </w> ", out
    assert len(out.split()) == 3 + 1  # ab, a, b, </w> — one merge only


def test_null_text_encodes_as_empty_document(spark):
    """ADVICE r08: a NULL text must count 0 words / 0 subwords (the
    oracle's left join yields 0), not encode the literal word 'None'."""
    from hpat_jl_spark.functions.bpe import bpe_encode_stats

    docs = spark.createDataFrame(
        [(1, "low lower"), (2, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bpe_encode_stats(docs, [("l", "o")]).collect()}
    assert rows[2].n_words == 0 and rows[2].n_subwords == 0
    assert rows[1].n_words == 2
