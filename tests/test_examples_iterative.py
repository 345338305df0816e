"""Run every reference-parity example at toy scale (the reference's
examples/, SURVEY §2.7/§2.9/§6) + the checkpointed iterative algorithm
(entry point C)."""

from __future__ import annotations

import math

from examples.blackscholes import price_options, synthesize as synth_bs
from examples.linear_regression import run as run_linreg
from examples.logistic_regression import synthesize as synth_lr
from examples.logistic_regression import train as train_lr
from examples.pi import estimate_pi
from hpat_jl_spark.operators.iterative import connected_components


def test_pi_example(spark):
    est = estimate_pi(spark, 200_000)
    assert abs(est - math.pi) < 0.02


def test_logreg_example(spark):
    coefs, intercept = train_lr(synth_lr(spark, 5_000, 4), 4, max_iter=15)
    # separable sum(f) > d/2 boundary → all positive coefficients
    assert all(c > 0 for c in coefs)


def test_linreg_example(spark):
    coefs, intercept = run_linreg(spark, 5_000)
    assert round(coefs[0], 3) == 3.0
    assert round(coefs[1], 3) == -2.0
    assert round(intercept, 3) == 1.0


def test_blackscholes_example(spark):
    import math as m

    out = price_options(synth_bs(spark, 500)).collect()
    for r in out:
        # call/put positivity + parity
        assert r.call > 0 and r.put >= 0
        parity = r.call - r.put - (r.price - r.strike * m.exp(-0.02 * r.t))
        assert abs(parity) < 1e-9
    # spot-check one row against exact math.erf pricing
    r = out[0]
    d1 = (m.log(r.price / r.strike) + (0.02 + 0.09 / 2) * r.t) / (0.3 * m.sqrt(r.t))
    d2 = d1 - 0.3 * m.sqrt(r.t)
    phi = lambda x: 0.5 * (1 + m.erf(x / m.sqrt(2)))
    exact = r.price * phi(d1) - r.strike * m.exp(-0.02 * r.t) * phi(d2)
    assert abs(r.call - exact) < 1e-4  # A&S approximation error bound


def test_connected_components(spark):
    # two components: {1,2,3,4} via chain, {10,11}; singleton 99 absent
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    out = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_pagerank_golden_graphs(spark):
    """Cycle → uniform ranks; star → center dominates, leaves equal."""
    from hpat_jl_spark.operators.iterative import pagerank

    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    r = {x.vertex: x.rank for x in pagerank(cyc).collect()}
    assert all(abs(v - 1.0) < 1e-4 for v in r.values())

    star = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    r2 = {x.vertex: x.rank for x in pagerank(star).collect()}
    assert r2[0] > 1.5 and abs(r2[1] - r2[2]) < 1e-6 and abs(r2[2] - r2[3]) < 1e-6


def test_monte_carlo_pi_query(spark):
    from hpat_jl_spark import registry

    registry.load_all_plans()
    r = registry.REGISTRY["monte_carlo_pi"].fn(spark, "unused").collect()[0]
    assert abs(r.pi_estimate - 3.14159) < 0.01


def test_corpus_prep_example(spark):
    """The end-to-end corpus pipeline composes: survivors are clean
    (no eval docs, no dupes), encodings non-empty, packing contiguous
    per source."""
    from examples.corpus_prep import prepare_corpus

    out = prepare_corpus(spark, "/root/testdata/sf0.001", context_len=256)
    rows = out.collect()
    assert rows
    assert all(r.doc_id % 10 != 0 for r in rows)  # eval slice excluded
    assert all(r.n_tokens == len(r.token_ids.split(",")) for r in rows)
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src_rows in by_src.values():
        src_rows.sort(key=lambda r: r.doc_id)
        run = 0
        for r in src_rows:
            assert (r.pack_id, r.pack_offset) == (run // 256, run % 256)
            run += r.n_tokens


def test_quasi_monte_carlo_pi_deterministic_and_tight(spark):
    """Halton integration: error bound is far tighter than MC at the
    same N, and the count is a pure function of the index — two runs
    must be bit-identical (no PRNG state anywhere)."""
    from hpat_jl_spark import registry

    registry.load_all_plans()
    fn = registry.REGISTRY["quasi_monte_carlo_pi"].fn
    r1 = fn(spark, "unused").collect()[0]
    r2 = fn(spark, "unused").collect()[0]
    assert r1 == r2
    assert abs(r1.pi_estimate - 3.14159265) < 1e-3
    assert r1.n_points == 65536


def test_bucketed_components_matches_fixpoint(spark):
    """bucketed_components must equal the general min-label fixpoint on
    any bucket-local edge set — the equivalence semantic_dedup_components
    now rests on. Deterministic pseudo-random graphs (seeded) across
    several shapes: chains (worst diameter), stars, cliques, singleton
    edges, and self-loops."""
    import random

    from hpat_jl_spark.operators.iterative import bucketed_components

    rng = random.Random(1234)
    for trial in range(3):
        rows = []
        vid = 0
        for bucket in range(4):
            n = rng.randint(2, 14)
            verts = [vid + i for i in range(n)]
            vid += n
            shape = rng.choice(["chain", "star", "clique", "pairs"])
            if shape == "chain":
                rows += [(bucket, a, b) for a, b in zip(verts, verts[1:])]
            elif shape == "star":
                rows += [(bucket, verts[0], v) for v in verts[1:]]
            elif shape == "clique":
                rows += [
                    (bucket, a, b)
                    for i, a in enumerate(verts)
                    for b in verts[i + 1 :]
                ]
            else:
                rng.shuffle(verts)
                rows += [
                    (bucket, verts[i], verts[i + 1])
                    for i in range(0, len(verts) - 1, 2)
                ]
            # occasional self-loop: must create membership, not crash
            if rng.random() < 0.5:
                rows.append((bucket, verts[0], verts[0]))
        edges = spark.createDataFrame(
            rows, "label int, id_a long, id_b long"
        )
        fast = {
            r.vertex: r.component
            for r in bucketed_components(edges, "label").collect()
        }
        slow = {
            r.vertex: r.component
            for r in connected_components(
                edges.select("id_a", "id_b"), "id_a", "id_b", max_iter=40
            ).collect()
        }
        assert fast == slow, f"trial {trial}: {fast} != {slow}"
