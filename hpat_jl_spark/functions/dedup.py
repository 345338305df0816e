"""Deduplication kernels: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Extension layer (no reference parity — SURVEY §4.1 note: minhash via
LSH is new surface). Design point is a 100 TB corpus:

- exact dedup: one hash-aggregate on a 128-bit fingerprint — a single
  shuffle of (fingerprint, doc_id), never of the text payload.
- MinHash+LSH: signatures are computed scan-side with built-in functions
  (portable md5 base hash under an affine permutation family). The
  SELF-join (minhash_candidates) bands DISTINCT signatures — keyed by
  an md5 fingerprint — and expands to id pairs only at output (r6:
  immune to duplicate-multiplicity blowup); the two-sided cross join
  (minhash_cross_candidates) stays id-level with the small side
  broadcast, which measured strictly faster for that shape (left ids
  never meet each other, so there is no quadratic hazard to escape).
  Candidate pairs are then verified with exact shingle Jaccard — only
  candidate docs' shingle arrays are re-joined, never the full corpus
  cross product.
- SimHash: 60-bit signature from per-token portable hashes; near-dup =
  signatures whose Hamming distance ≤ k, found by banding the 60 bits
  into 4×15-bit keys (any equal band → candidate; catches all pairs
  with distance < bands by pigeonhole, standard simhash blocking).

All hashing is deterministic across runs/partitions, so every query
here is reproducible. Both MinHash and SimHash hash through the
*portable* md5-derived base hash (same value in Spark and DuckDB), so
both full pipelines — signatures, bands, candidate sets — have exact
DuckDB oracles.
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hpat_jl_spark.functions.text import fingerprint, shingles, tokens

# Mersenne prime 2^61-1: modulus for minhash permutations
_MERSENNE = (1 << 61) - 1

# Fixed seed for the minhash permutation family — shared with the DuckDB
# oracle SQL generated in plans/text_pipeline.py.
_MINHASH_SEED = 20260813


def minhash_coefficients(num_hashes: int) -> list[tuple[int, int]]:
    """(α_i, β_i) for the affine permutation family, fixed-seed so the
    Spark plan and the DuckDB oracle derive the identical family.
    α_i ∈ [1, 2^31) odd, β_i ∈ [0, 2^61): keeps α·h + β < 2^63 (ANSI
    mode raises on long overflow — CLAUDE.md trap)."""
    rng = random.Random(_MINHASH_SEED)
    return [
        (rng.randrange(1, 1 << 31) | 1, rng.randrange(0, 1 << 61))
        for _ in range(num_hashes)
    ]


def portable_hash(col: Column | str) -> Column:
    """60-bit non-negative string hash computable identically in Spark
    and DuckDB: the first 15 hex chars of md5, parsed as an integer.
    Spark: conv(substr(md5, 1, 15), 16, 10); DuckDB twin:
    ('0x' || substr(md5(s), 1, 15))::BIGINT. Both are JVM/vectorized
    built-ins — no Python in the path. Used as the MinHash base hash so
    the LSH candidate set is exactly reproducible by the oracle
    (xxhash64 has no DuckDB equivalent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized-text fingerprint; keeps the lowest id
    per group (deterministic canonical representative) and reports the
    duplicate count. Output: (keep_id, n_dups, fingerprint)."""
    return (
        docs.withColumn("fingerprint", fingerprint(text_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    fanout: int | None = None,
) -> DataFrame:
    """MinHash signatures as one row per doc: columns mh0..mh{H-1}.

    Permutation family: the standard single-base-hash affine family
    h_i(s) = (α_i·h(s) + β_i) mod 2^61-1, h(s) = portable_hash(s) mod
    2^31-1, with per-i constants from minhash_coefficients (fixed-seed
    RNG) — one string hash per shingle, H cheap affine maps. The base
    hash is the md5-derived portable_hash (not xxhash64) so the ENTIRE
    pipeline — shingles → signature → bands → candidate pairs — has an
    exact DuckDB twin; md5 costs ~2× xxhash64 per shingle but stays in
    codegen and is a scan-side map, not a shuffle.
    (A per-shingle affine variant h_i = a(s)+i·b(s) is NOT min-wise
    independent — a single shared small-b shingle dominates every i and
    manufactures false near-dups; caught by the planted-dup tests.)

    Physical shape (the 100 TB-safe one): repartition docs to all cores
    (tiny local files arrive as one partition; at scale the scan is
    already split) → explode shingles → 2 hash columns → groupBy(doc)
    with H min-aggregates. The mins fold map-side (partial hash
    aggregation), so the shuffle carries exactly (id, H longs) per doc —
    never the shingles. An earlier expression-tree formulation
    (array_min over transform, ×H) spent ~20 s in codegen alone at ANY
    data size; aggregation is the right primitive, not nested array
    lambdas.

    ``fanout`` (r13, the r9 byte-sized width rule): the pinned
    exchange feeds per-task partial-agg state (H mins per distinct id
    — corpus/width bytes per task), so plan-level callers pass
    max(defaultParallelism, sized_shuffle_partitions(sf_dir)); bare
    defaultParallelism (the default here, for callers without an
    sf_dir) under-fans amplified corpora — the exact q01 ×100 OOM
    class r9 documented.
    """
    coefs = minhash_coefficients(num_hashes)
    par = fanout or docs.sparkSession.sparkContext.defaultParallelism
    sh = (
        docs.repartition(par)
        .select(
            F.col(id_col).alias("id"),
            F.explode(shingles(text_col, shingle_n)).alias("sh"),
        )
        .select("id", F.pmod(portable_hash("sh"), F.lit((1 << 31) - 1)).alias("h"))
    )
    aggs = [
        F.min(F.pmod(a * F.col("h") + b, F.lit(_MERSENNE))).alias(f"mh{i}")
        for i, (a, b) in enumerate(coefs)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_banded(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    fanout: int | None = None,
) -> DataFrame:
    """Id-level LSH banding: (id, band, bhash), one row per
    (doc, band) — narrow on purpose (the r10 ×100 profile showed the
    full 32-long sig array rode along 8× per doc for no consumer).
    Consumed by the two-sided cross join (minhash_cross_candidates),
    whose broadcast-right shape keeps id-level banding optimal; the
    SELF-join (minhash_candidates) bands distinct signatures instead
    (see its docstring)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n, fanout)
    band_keys = [
        F.struct(
            F.lit(b).alias("band"),
            portable_hash(
                F.concat_ws(
                    ",", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                )
            ).alias("bhash"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        "id",
        F.explode(F.array(*band_keys)).alias("bk"),
    ).select("id", "bk.band", "bk.bhash")


def minhash_cross_candidates(
    docs: DataFrame,
    left_pred,
    right_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    fanout: int | None = None,
) -> DataFrame:
    """Candidate pairs BETWEEN two slices of one corpus (e.g. training
    docs × eval docs for fuzzy decontamination): bands are computed in
    one pass, then only left-slice × right-slice bucket-mates pair up —
    the left²/right² pairs a self-join would also emit (and a
    decontaminator would discard) never materialize. The right slice is
    the small side by convention and is broadcast, so the big side is
    never shuffled at all. Returns distinct (id_left, id_right).

    ``left_pred``/``right_pred``: Column-predicate functions of the id
    column selecting the two (disjoint) slices.

    The banded stream is persisted: both side-filters consume it, and
    without the cache each branch re-scans the corpus and recomputes
    the full minhash expression tree — the r10 ×100 profile measured
    that duplicate signature pass at 312 s of task time (26% of the
    query). The cached frame is the narrow (id, band, bhash) projection
    (the small-derived-frame persist that pays, CLAUDE.md r6 — never
    the wide text/shingle stream), filled by the broadcast-build job
    and reused by the probe-side stream."""
    from pyspark import StorageLevel

    banded = minhash_banded(
        docs, text_col, id_col, num_hashes, bands, shingle_n, fanout
    ).persist(StorageLevel.MEMORY_AND_DISK)
    left = banded.filter(left_pred(F.col("id"))).select(
        F.col("id").alias("id_left"), "band", "bhash"
    )
    right = banded.filter(right_pred(F.col("id"))).select(
        F.col("id").alias("id_right"), "band", "bhash"
    )
    return (
        left.join(F.broadcast(right), ["band", "bhash"])
        .select("id_left", "id_right")
        .dropDuplicates(["id_left", "id_right"])
    )


def minhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    fanout: int | None = None,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` groups of
    ``num_hashes/bands`` values, hash each band, self-join on
    (band_index, band_hash). Returns candidate pairs (id_a < id_b) with
    the fraction of matching minhashes (estimated Jaccard).

    Physical shape (r6 — SIGNATURE-level banding, the same rationale as
    simhash_candidates): verbatim duplicates share a full signature, so
    the band self-join runs over DISTINCT signatures — keyed by an md5
    fingerprint of the 32 values (128-bit, collision-free at any corpus
    size; joining on the 32-long array itself would work but shuffles
    4× the bytes) — and id-level pairs only materialize as the final
    output expansion. The previous id-level band join shipped both
    32-long signatures once per shared band and deduped afterwards: at
    the ×100 scaling tier (100 verbatim copies per doc, which share all
    8 bands) that pre-dedup stream measured 241 s. Sig-level banding
    joins over ~|distinct content| rows regardless of duplication rate;
    nothing upstream of the output expansion exceeds O(distinct sigs +
    output). est_jaccard is a function of the two sigs, so it is
    computed once per DISTINCT sig pair before expansion; same-sig
    pairs are exactly 32/32 = 1.0 by definition. A degenerate band
    bucket (e.g. empty docs) remains the skew hazard; cap with AQE
    skew-join or a bucket-size guard upstream.
    """
    from pyspark import StorageLevel

    # Persisted: four consumers (distinct sigs + two expansion maps +
    # the same-sig self-join) over one narrow (id, fp, sig) row per doc
    # — the small-derived-frame persist that pays (CLAUDE.md r6 trap;
    # wide exploded streams must NOT be persisted, this is the
    # opposite case).
    base = (
        minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n, fanout)
        .select(
            "id",
            F.md5(
                F.concat_ws(",", *[F.col(f"mh{i}") for i in range(num_hashes)])
            ).alias("fp"),
            F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]).alias("sig"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dsig = base.select("fp", "sig").dropDuplicates(["fp"])
    rows_per_band = num_hashes // bands
    band_keys = [
        F.struct(
            F.lit(b).alias("band"),
            portable_hash(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(F.col("sig"), b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("bhash"),
        )
        for b in range(bands)
    ]
    banded = dsig.select("fp", F.explode(F.array(*band_keys)).alias("bk")).select(
        "fp", "bk.band", "bk.bhash"
    )
    fp_pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.fp") < F.col("b.fp")),
        )
        .select(F.col("a.fp").alias("fp_a"), F.col("b.fp").alias("fp_b"))
        .dropDuplicates(["fp_a", "fp_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    ).cast("double") / F.lit(float(num_hashes))
    scored = (
        fp_pairs.join(
            dsig.select(F.col("fp").alias("fp_a"), F.col("sig").alias("sig_a")),
            "fp_a",
        )
        .join(
            dsig.select(F.col("fp").alias("fp_b"), F.col("sig").alias("sig_b")),
            "fp_b",
        )
        .select("fp_a", "fp_b", est.alias("est_jaccard"))
    )
    cross = (
        scored.join(
            base.select(F.col("fp").alias("fp_a"), F.col("id").alias("id_x")),
            "fp_a",
        )
        .join(
            base.select(F.col("fp").alias("fp_b"), F.col("id").alias("id_y")),
            "fp_b",
        )
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
            "est_jaccard",
        )
    )
    same = (
        base.alias("a")
        .join(
            base.alias("b"),
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.lit(1.0).alias("est_jaccard"),
        )
    )
    return cross.unionByName(same)


def simhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    fanout: int | None = None,
) -> DataFrame:
    """SimHash signatures: one row per doc with column ``sig`` =
    array<int> of 0/1 (length ``bits``): majority vote per bit over
    token hashes.

    The token hash is the 60-bit md5-derived portable_hash (r4: was
    xxhash64/64-bit) so the signature — and therefore the banded
    candidate set — has an exact DuckDB twin; 60 bits lose nothing
    meaningful vs Manku's 64 (collision scale is governed by the band
    width, still 15 bits at the default 4 bands).

    The signature is a single PACKED LONG (bit i of ``sig`` = majority
    vote of token-hash bit i), not an array<int> of 0/1 (r5, VERDICT
    r04 #2): band keys become shift/mask long arithmetic and Hamming
    distance becomes bit_count(a XOR b) — all whole-stage codegen,
    where the array form paid interpreted zip_with/filter higher-order
    functions per pair and a 60-element array through every shuffle.

    Physical shape: explode tokens → md5 hash (JVM codegen — hashing
    never touches Python) → one collect_list shuffle of (id, hashes) →
    numpy majority vote per doc in an Arrow kernel. The shuffle carries
    one long per token; the per-bit work is a single vectorized
    popcount. Two earlier formulations were slower: 64 conditional-sum
    aggregates (~9 s of codegen/agg overhead at sf0.1) and a pure-Python
    md5-per-token kernel (~5 s of interpreter hashing — the difference
    vs this design is WHERE md5 runs, JVM codegen vs interpreter)."""
    import numpy as np

    par = fanout or docs.sparkSession.sparkContext.defaultParallelism
    bit_idx = np.arange(bits, dtype=np.uint64)

    hashed = (
        docs.repartition(par)
        .select(
            F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok")
        )
        .select("id", portable_hash("tok").alias("h"))
        .groupBy("id")
        .agg(F.collect_list("h").alias("hs"))
    )

    def kernel(batches):
        for pdf in batches:
            sigs = []
            for hs in pdf["hs"]:
                if len(hs) == 0:
                    sigs.append(0)
                    continue
                arr = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                counts = ((arr[:, None] >> bit_idx) & np.uint64(1)).sum(axis=0)
                packed = ((2 * counts > len(arr)).astype(np.uint64) << bit_idx).sum()
                sigs.append(int(packed))  # < 2^60, fits a signed long
            yield pd.DataFrame({"id": pdf["id"].astype("int64"), "sig": sigs})

    return hashed.mapInPandas(kernel, "id long, sig long")


def simhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    fanout: int | None = None,
) -> DataFrame:
    """Near-dup candidates by SimHash banding: any shared band →
    candidate; verify by exact Hamming distance ≤ max_hamming.

    Recall guarantee (ADVICE r01): two signatures at Hamming distance d
    are certain to share a band only when d < bands (pigeonhole — d
    differing bits can spoil at most d bands), so ``max_hamming >=
    bands`` is rejected rather than silently under-recalling (the old
    4-band/max_hamming=6 defaults found distance-4-6 pairs only when
    luck put the flips in ≤3 bands). The default budget is therefore
    bands-1 = 3, the standard simhash near-dup radius (Manku et al.
    use k=3 for 64-bit web dedup).

    Raising the budget requires raising ``bands`` — and paying for it:
    band keys narrow from bits/bands, so candidate pairs grow roughly
    ×2^(width_old - width_new) per band. Measured on the sf0.1
    documents table: bands 4→8 (16→8-bit keys) inflated the
    dedup_simhash query from 5.3 s to 85 s. The cost is intrinsic
    (Manku's design pays it via permuted sorted tables); choose the
    smallest budget the corpus needs.

    Physical shape (r6 rewrite — SIGNATURE-level banding): verbatim
    duplicates share a signature, so the band self-join runs over
    DISTINCT sigs and id-level pairs only materialize as the final
    output expansion. The r5 id-level band join emitted every id pair
    once per shared band (identical sigs share ALL bands) and then
    dropDuplicates'd the stream: at the ×100 scaling tier (100 verbatim
    copies per doc) that was a ~10⁸-row pre-dedup shuffle and measured
    1189 s — 2× past even the C(100,2) pair-OUTPUT bound, because the
    intermediate stream carries the band multiplicity the output
    doesn't have. Sig-level banding does the join over ~|distinct
    content| rows regardless of duplication rate; the C(g,2)-per-group
    output rows are produced by the final expansion joins, which is
    the output itself — nothing upstream of it exceeds
    O(distinct sigs + output). This is also the honest 100 TB shape:
    near-dup always runs AFTER exact dedup collapses verbatim copies,
    and this plan gives that collapse structurally."""
    from pyspark import StorageLevel

    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} cannot be guaranteed by "
            f"bands={bands}: banding only finds all pairs at Hamming "
            f"distance < bands (pigeonhole). Raise bands to at least "
            f"{max_hamming + 1} (a divisor of bits={bits}) or lower "
            f"max_hamming to {bands - 1}."
        )
    if bits % bands:
        raise ValueError(f"bands={bands} must divide bits={bits}")
    per_band = bits // bands
    mask = (1 << per_band) - 1
    # Persisted: the signature kernel is a narrow pipeline (no ending
    # exchange), and FOUR consumers read it (distinct sigs, the two
    # expansion maps, the same-sig join). One packed long per doc —
    # the small-derived-frame persist that pays (CLAUDE.md r6 trap:
    # wide exploded streams must NOT be persisted; this is the
    # opposite case).
    sigs = simhash_signatures(docs, text_col, id_col, bits, fanout).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dsig = sigs.select("sig").distinct()
    # Packed-long banding (r5): band b's key is bits [b*per_band,
    # (b+1)*per_band) extracted by shift/mask — two long ops per band
    # in codegen.
    banded = dsig.select(
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("sig", "bk.band", "bk.bkey")
    # Hamming over packed longs: XOR + popcount, whole-stage codegen
    # (the array formulation paid an interpreted zip_with+filter per
    # candidate pair — the r3→r4 bench regression, VERDICT r04 #2).
    # Verified per DISTINCT sig pair — Hamming is a function of the
    # sigs, so verifying before expansion does strictly less work.
    sig_pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.sig") < F.col("b.sig")),
        )
        .select(F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
        .dropDuplicates(["sig_a", "sig_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    # Expansion: each unordered id pair appears exactly once — an id
    # has ONE sig, so a cross-sig pair surfaces under exactly one
    # (sig_a < sig_b) row, and same-sig pairs only in the self-join.
    cross = (
        sig_pairs.join(
            sigs.select(F.col("sig").alias("sig_a"), F.col("id").alias("id_x")),
            "sig_a",
        )
        .join(
            sigs.select(F.col("sig").alias("sig_b"), F.col("id").alias("id_y")),
            "sig_b",
        )
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
            "hamming",
        )
    )
    same = (
        sigs.alias("a")
        .join(
            sigs.alias("b"),
            (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(same)


def jaccard_pairs(
    docs: DataFrame,
    bucket_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact (unigram) Jaccard similarity for all pairs within a bucket.
    The bucket columns bound the O(n²): at 100 TB you bucket by
    (lang, source, length-band) or by LSH band, never globally."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in bucket_cols],
        F.array_distinct(tokens(text_col)).alias("words"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    cond = (F.col("a.id") < F.col("b.id"))
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = F.size(F.array_intersect(F.col("a.words"), F.col("b.words")))
    union = F.size(F.array_union(F.col("a.words"), F.col("b.words")))
    jac = inter.cast("double") / union
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") > threshold)
    )


def neardup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Transitive near-dup clustering: MinHash+LSH candidate pairs →
    connected components → canonical id per cluster (the component's
    minimum doc id). Returns every document as (doc_id, canonical_id);
    singletons map to themselves.

    This is the stage pair-finding alone cannot replace: if A≈B and
    B≈C but A and C don't share a band, pairwise dedup keeps one of
    {A,B} and one of {B,C} — clustering keeps exactly one of {A,B,C}.

    Scale: label propagation iterates only over the candidate EDGES
    (near-dup pairs are a tiny fraction of the corpus), never the docs;
    each iteration is one join+min-aggregate on the edge set with
    lineage checkpointed (operators/iterative.py). The final
    canonical-id attach is a left join of docs against the clustered
    vertices only.
    """
    from hpat_jl_spark.operators.iterative import connected_components

    pairs = minhash_candidates(
        docs, text_col, id_col, num_hashes, bands, shingle_n
    ).filter(F.col("est_jaccard") >= threshold)
    comp = connected_components(pairs, "id_a", "id_b")
    return docs.select(F.col(id_col).alias("doc_id")).join(
        comp, F.col("doc_id") == comp.vertex, "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("canonical_id"),
    )


def prefix_filter_jaccard(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the ppjoin
    blocking scheme): a pair with token-set Jaccard ≥ t must share at
    least one token among each side's first |d| − ⌈t·|d|⌉ + 1 tokens
    when every document orders its tokens rare-first. Unlike MinHash
    LSH this has NO false negatives — the prefix join only prunes pairs
    that provably cannot reach the threshold.

    Plan: global token frequencies (one hash agg) joined back on token
    — NOT force-broadcast: the vocabulary grows with the corpus (a
    100 TB crawl has 10⁸+ distinct tokens), so the hint is left to AQE,
    which still broadcasts while the vocab measures small but falls
    back to a shuffle join keyed on token at scale. Each doc then sorts
    its tokens by (freq, token) locally — an array_sort over structs,
    no global rank window — takes the prefix slice, and explodes ONLY
    prefix tokens into the candidate equi-join. Exact Jaccard then
    verifies candidates on the full token arrays. At corpus scale the
    candidate volume is bounded by prefix length (shrinking as t
    grows); the rare-first order keeps hot tokens out of prefixes,
    which is what makes the token join skew-safe."""
    from pyspark.sql.types import ArrayType, StringType

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens(text_col)).alias("w"),
    )
    tok_rows = toks.select("id", F.explode("w").alias("tok"))
    freq = tok_rows.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    ranked = (
        tok_rows.join(freq, "tok")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tf", "tok"))),
                lambda s: s.tok,
            ).alias("sorted_w")
        )
    )
    size = F.size("sorted_w")
    prefix_len = size - F.ceil(F.lit(threshold) * size).cast("int") + 1
    with_prefix = ranked.select(
        "id",
        "sorted_w",
        F.slice("sorted_w", F.lit(1), prefix_len).alias("prefix"),
    )
    cand = (
        with_prefix.select("id", F.col("sorted_w").alias("wa"), F.explode("prefix").alias("tok"))
        .alias("a")
        .join(
            with_prefix.select(
                F.col("id").alias("id_b"),
                F.col("sorted_w").alias("wb"),
                F.explode("prefix").alias("tok"),
            ).alias("b"),
            (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("id_b")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("id_b").alias("doc_b"), "wa", "wb")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("wa", "wb"))
    union = F.size(F.array_union("wa", "wb"))
    jac = inter.cast("double") / union
    return cand.select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def keep_first_paragraphs(
    paras: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    text_col: str = "para",
) -> DataFrame:
    """Corpus-wide keep-first paragraph dedup (the Dolma/RefinedWeb
    exact-paragraph pass): every occurrence of a paragraph except the
    globally first one — ordered by (doc id, position) — is dropped.

    One aggregation, zero joins: group by the paragraph fingerprint and
    take ``min(struct(id, pos, text))``. min over a struct is an
    algebraic aggregate, so Spark plans it partial+final: the map side
    collapses every local repeat of a boilerplate paragraph before the
    shuffle, which is exactly what makes the heavy-hitter key (the one
    paragraph that appears in half the corpus) survivable — the reducer
    for that fingerprint sees one candidate row per input partition,
    not one per occurrence. Reference analogue: the groupby/unique
    surface (SURVEY §2.4) composed into a cleaning pass the reference
    never shipped.
    """
    first = F.min(F.struct(id_col, pos_col, text_col)).alias("first")
    return (
        paras.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(first)
        .select(f"first.{id_col}", f"first.{pos_col}", f"first.{text_col}")
    )
