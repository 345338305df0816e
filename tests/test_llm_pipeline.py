"""Planted-data semantics for the LLM-pipeline plans
(plans/llm_pipeline.py). The sf0.01 oracle sweep checks these against
DuckDB on the fixtures; here the behaviors are pinned on constructed
inputs where the right answer is known by hand.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpat_jl_spark.plans.llm_pipeline import (
    _EMAIL_RE,
    _PHONE_RE,
    _word_grams,
)
from hpat_jl_spark.registry import REGISTRY
from hpat_jl_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_word_grams_planted(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c"), (3, "x")], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.gram)
        for r in _word_grams(df, 4).collect()
    }
    assert got == {(1, "a b c d"), (1, "b c d e")}  # doc 2/3 too short


def test_decontaminate_flags_planted_overlap(spark):
    # doc 10 is "eval" (doc_id % 10 == 0); doc 11 shares one 4-gram with
    # it, doc 12 shares none.
    df = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),
            (11, "zz alpha beta gamma delta yy"),
            (12, "one two three four five six"),
        ],
        ["doc_id", "text"],
    )
    grams = _word_grams(df, 4).distinct()
    train = grams.filter(F.col("doc_id") % 10 != 0)
    ev = grams.filter(F.col("doc_id") % 10 == 0).select("gram").distinct()
    out = {
        r.doc_id: r.n
        for r in train.join(ev, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == {11: 1}


def test_pii_regexes_scrub_planted_pii(spark):
    df = spark.createDataFrame(
        [("mail me at jane.doe+x@sub.example.org or call +1-555-0199 now",)],
        ["raw"],
    )
    row = df.select(
        F.regexp_replace(
            F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("scrubbed"),
        (
            F.size(F.regexp_extract_all("raw", F.lit(_EMAIL_RE), 0))
            + F.size(F.regexp_extract_all("raw", F.lit(_PHONE_RE), 0))
        ).alias("n"),
    ).first()
    assert row.scrubbed == "mail me at <EMAIL> or call <PHONE> now"
    assert row.n == 2


def test_pii_scrub_counts_follow_injection_rule(spark):
    # doc_id % 6 == 0 → email+phone; % 3 == 0 only → email; % 2 == 0
    # only → phone; else none.
    out = REGISTRY["pii_scrub"].fn(spark, SF_SMOKE)
    rows = out.collect()
    assert rows
    for r in rows:
        want = (1 if r.doc_id % 3 == 0 else 0) + (1 if r.doc_id % 2 == 0 else 0)
        assert r.n_redactions == want, r


def test_tfidf_ubiquitous_term_scores_zero(spark):
    # A term present in EVERY doc has idf = ln(1) = 0; the top term must
    # be a distinguishing one.
    df = spark.createDataFrame(
        [(1, "the cat the"), (2, "the dog")], ["doc_id", "text"]
    )
    toks = df.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = df.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = tf.join(dfreq, "term").crossJoin(n).withColumn(
        "tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df").cast("double"))
    )
    got = {(r.doc_id, r.term): round(r.tfidf, 6) for r in scored.collect()}
    assert got[(1, "the")] == 0.0 and got[(2, "the")] == 0.0
    assert got[(1, "cat")] > 0 and got[(2, "dog")] > 0


def test_inverted_index_postings_sorted_numerically(spark):
    # doc ids 9 and 10 share a token: a string sort would yield "10,9".
    df = spark.createDataFrame(
        [(9, "rare common"), (10, "rare common"), (2, "common")],
        ["doc_id", "text"],
    )
    toks = df.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).distinct()
    posting = toks.groupBy("token").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")), lambda d: d.cast("string")
            ),
            ",",
        ).alias("postings")
    )
    got = {r.token: r.postings for r in posting.collect()}
    assert got["rare"] == "9,10"
    assert got["common"] == "2,9,10"


def test_heavy_hitters_deterministic_top(spark):
    out1 = [tuple(r) for r in REGISTRY["heavy_hitters"].fn(spark, SF_SMOKE).collect()]
    out2 = [tuple(r) for r in REGISTRY["heavy_hitters"].fn(spark, SF_SMOKE).collect()]
    assert out1 == out2
    assert len(out1) <= 20
    counts = [c for _, c in out1]
    assert counts == sorted(counts, reverse=True)


def test_decontaminate_runs_on_fixture(spark):
    out = REGISTRY["benchmark_decontaminate"].fn(spark, SF_SMOKE)
    rows = out.collect()
    # every flagged doc is a train doc with a positive overlap count
    for r in rows:
        assert r.doc_id % 10 != 0 and r.n_shared_grams >= 1


def test_tokenize_to_ids_planted_vocab_rank(spark):
    # "b" appears 4×, "a" 2×, "c"/"d" 1× (tie → lexicographic):
    # ids b=0, a=1, c=2, d=3
    from hpat_jl_spark.plans.llm_pipeline import encode_corpus_to_ids

    docs = spark.createDataFrame(
        [(1, "a b b"), (2, "b a c"), (3, "d b")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: (r.n_tokens, r.token_ids)
        for r in encode_corpus_to_ids(spark, docs, vocab_size=16).collect()
    }
    assert out == {1: (3, "1,0,0"), 2: (3, "0,1,2"), 3: (2, "3,0")}


def test_tokenize_to_ids_oov_maps_to_cap_id(spark):
    # vocab_size=2 keeps b(0), a(1); c and d BOTH collapse to OOV id 2,
    # and n_tokens still counts OOV occurrences.
    from hpat_jl_spark.plans.llm_pipeline import encode_corpus_to_ids

    docs = spark.createDataFrame(
        [(1, "a b b"), (2, "b a c d c")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: (r.n_tokens, r.token_ids)
        for r in encode_corpus_to_ids(spark, docs, vocab_size=2).collect()
    }
    assert out == {1: (3, "1,0,0"), 2: (5, "0,1,2,2,2")}


def test_sequence_packing_crosses_boundary(spark):
    from hpat_jl_spark.plans.llm_pipeline import sequence_packing  # noqa: F401
    from hpat_jl_spark.registry import REGISTRY as R

    out = R["sequence_packing"].fn(spark, SF_SMOKE).collect()
    assert out
    # reconstruct per-source contiguity: offsets restart at each pack
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r.doc_id)
        run = 0
        for r in rows:
            assert r.pack_id == run // 512 and r.pack_offset == run % 512, r
            run += r.n_tokens


def test_domain_mix_weights_normalized_and_upweighted(spark):
    from hpat_jl_spark.registry import REGISTRY as R

    rows = R["domain_mix_report"].fn(spark, SF_SMOKE).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-3
    # temperature < 1 up-weights small sources: weight/share ratio is
    # monotonically decreasing in share
    by_share = sorted(rows, key=lambda r: r.token_share)
    ratios = [r.mix_weight / r.token_share for r in by_share if r.token_share > 0]
    assert all(a >= b - 1e-9 for a, b in zip(ratios, ratios[1:]))


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1"]), st.integers(1, 700)),
        min_size=1,
        max_size=40,
    ),
    context=st.sampled_from([128, 512]),
)
def test_sequence_packing_matches_sequential_reference(spark, docs, context):
    """The window prefix-sum formulation equals the obvious sequential
    packer on arbitrary (source, n_tokens) inputs — including docs
    longer than the context length (they still get a deterministic
    (pack, offset) slot; the chunker downstream splits them)."""
    from pyspark.sql import Window

    rows = [(i, src, n) for i, (src, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    got = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in df.withColumn(
            "tok_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .select(
            "doc_id",
            F.floor(F.col("tok_before") / context).cast("bigint").alias("pack_id"),
            (F.col("tok_before") % context).cast("bigint").alias("pack_offset"),
        )
        .collect()
    }
    # sequential reference
    want, run = {}, {}
    for i, (src, n) in enumerate(rows_iter := [(s, n) for _, s, n in rows]):
        before = run.get(src, 0)
        want[i] = (before // context, before % context)
        run[src] = before + n
    assert got == want


def test_fuzzy_name_pairs_planted(spark):
    """FastSS wildcard blocking: exactly the hamming-≤1 equal-length
    pairs come out — 2-substitution and different-length lookalikes
    don't (kernel replicated on a planted frame; the fixture path is
    oracle-checked)."""
    cust = spark.createDataFrame(
        [("alpha",), ("alphq",), ("alpXY",), ("alphaz",), ("beta0",), ("beta1",)],
        ["name"],
    )
    variants = cust.select(
        "name",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("name")),
                lambda i: F.concat(
                    F.expr("name").substr(F.lit(1), i - 1),
                    F.lit("\x01"),
                    F.expr("name").substr(i + 1, F.length("name")),
                ),
            )
        ).alias("variant"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    pairs = (
        a.join(b, "variant")
        .filter(F.col("a.name") < F.col("b.name"))
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 1)
    )
    got = {(r.name_a, r.name_b) for r in pairs.collect()}
    assert got == {("alpha", "alphq"), ("beta0", "beta1")}


def test_weighted_sample_favors_heavy_docs(spark):
    """E-S priorities: the length-weighted sample over-represents long
    docs relative to a uniform draw, and is deterministic."""
    from hpat_jl_spark.registry import REGISTRY as R
    from hpat_jl_spark.tables import load_table

    out1 = R["weighted_sample_docs"].fn(spark, SF_SMOKE).collect()
    out2 = R["weighted_sample_docs"].fn(spark, SF_SMOKE).collect()
    assert [r.doc_id for r in out1] == [r.doc_id for r in out2]
    docs = load_table(spark, "documents", SF_SMOKE)
    mean_all = (
        docs.select(F.avg(F.size(F.split(F.trim("text"), r"\s+"))).alias("m"))
        .first()
        .m
    )
    mean_sample = sum(r.n_tokens for r in out1) / len(out1)
    assert mean_sample > mean_all  # heavier docs over-represented
    # priorities sorted desc
    pris = [r.priority for r in out1]
    assert pris == sorted(pris, reverse=True)


def test_unigram_surprisal_planted(spark):
    """Hand-computed corpus: tokens a:2 b:1 c:1, N=4 — mirrors
    plans/llm_pipeline.unigram_logprob_quality's kernel on explicit
    rows (load_table pins the fixture schema, so the kernel is
    replicated on a createDataFrame twin)."""
    import math

    docs = spark.createDataFrame([(1, "a a b"), (2, "c")], ["doc_id", "text"])
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    )
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").cast("double").alias("s"))
    got = {
        r.doc_id: (r.n_tokens, r.avg_nll)
        for r in tok.join(freq, "t").crossJoin(tot)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("s"))), 5).alias("avg_nll"),
        )
        .collect()
    }
    ln = math.log
    assert got == {
        1: (3, round((2 * -ln(2 / 4) + -ln(1 / 4)) / 3, 5)),
        2: (1, round(-ln(1 / 4), 5)),
    }


def test_unigram_surprisal_fixture_bounds(spark):
    rows = REGISTRY["unigram_logprob_quality"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_tokens >= 1
        assert r.avg_nll > 0  # -ln p is positive for p < 1


def test_c4_line_filter_rules_planted(spark):
    """Each C4 rule triggers independently on constructed docs (kernel
    replicated on explicit rows; 7-token lines, '.' on every 3rd):
    doc 1 line0 keeps (7 words, punct, clean); doc 2 line0 has the
    blocked word; doc 3 is 4 tokens (short line)."""
    rows = [
        (1, "w1 w2 w3 w4 w5 w6 w7 x1 x2 x3 x4 x5 x6 x7"),  # 2 lines, i=1 unpunct
        (2, "slow w2 w3 w4 w5 w6 w7"),                      # blocked word
        (3, "w1 w2 w3 w4"),                                 # short line
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    t = F.split(F.trim("text"), r"\s+")
    n_lines = F.ceil(F.size(t) / 7.0).cast("int")

    def line_struct(i):
        larr = F.slice(t, i * 7 + 1, 7)
        line = F.concat(
            F.array_join(larr, " "),
            F.when(i % 3 == 0, F.lit(".")).otherwise(F.lit("")),
        )
        keep = (
            (i % 3 == 0) & (F.size(larr) >= 5) & ~F.array_contains(larr, "slow")
        )
        return F.struct(line.alias("line"), keep.alias("keep"))

    lines = F.transform(F.sequence(F.lit(0), n_lines - 1), line_struct)
    kept = F.filter(lines, lambda s: s["keep"])
    out = {
        r.doc_id: (r.n_lines, r.n_kept, r.kept_lines)
        for r in docs.select(
            "doc_id",
            F.size(lines).cast("bigint").alias("n_lines"),
            F.size(kept).cast("bigint").alias("n_kept"),
            F.transform(kept, lambda s: s["line"]).alias("kept_lines"),
        ).collect()
    }
    assert out[1] == (2, 1, ["w1 w2 w3 w4 w5 w6 w7."])  # line 1 lacks punct
    assert out[2] == (1, 0, [])  # blocklist hit
    assert out[3] == (1, 0, [])  # under 5 words


def test_sequence_packing_chunked_path_matches_window_path(spark):
    """VERDICT r03 #4 pin: a 90%-dominant source must produce IDENTICAL
    pack assignments via the single-sort-run window path and the
    per-source chunked Exscan path (forced by max_sort_run=0)."""
    import random

    from hpat_jl_spark.plans.llm_pipeline import pack_sequences

    rng = random.Random(7)
    rows = [(i, "big" if i % 10 else "small", rng.randrange(1, 400))
            for i in range(2000)]
    n = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    key = lambda r: (r.source, r.doc_id)  # noqa: E731
    via_window = sorted(pack_sequences(n, 512, max_sort_run=10**9).collect(), key=key)
    via_chunks = sorted(
        pack_sequences(n, 512, max_sort_run=0, num_chunks=16).collect(), key=key
    )
    assert via_window == via_chunks
    assert any(r.pack_id > 0 for r in via_window)  # packing actually crosses


def test_sequence_packing_cheap_probe_branches_like_precise(spark):
    """r12 probe refinement pin: the total-row count only UPPER-BOUNDS
    the largest source, so when total > max_sort_run but every source
    is individually under it, the precise fallback probe must still
    select the WINDOW path (observable as a Window node in the plan),
    exactly as the original per-source probe did. And a total under the
    threshold picks the window path from the cheap count alone."""
    from hpat_jl_spark.plans.llm_pipeline import pack_sequences

    rows = [(i, f"s{i % 4}", 10) for i in range(2000)]
    n = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")

    def plan_of(max_sort_run):
        df = pack_sequences(n, 512, max_sort_run=max_sort_run)
        return df._jdf.queryExecution().optimizedPlan().toString()

    # The chunked path is identifiable by its __chunk bookkeeping
    # column (exscan_chunked); the window path never materializes it.
    # total=2000 > 1000 >= biggest=500: fallback probe -> window path
    assert "__chunk" not in plan_of(1000)
    # total=2000 <= 10**9: cheap count alone -> window path
    assert "__chunk" not in plan_of(10**9)
    # biggest=500 > 100: chunked path
    assert "__chunk" in plan_of(100)
