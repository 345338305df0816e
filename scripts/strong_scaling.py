#!/usr/bin/env python
"""Strong-scaling probe: fixed data, varying executor-thread count —
the third axis of the repo's scale evidence and the one that directly
backs the "1000-executor cluster" claim (two input regimes: the
split-rich ×10 staging and the probe's ×100 tier):

  SCALING.md  — wall-clock vs DATA tiers   (no hidden quadratics)
  SHUFFLE.md  — BYTES per query            (what crosses the network)
  CORES.md    — wall-clock vs PARALLELISM  (does the plan actually
                use the workers it is given?)

Method: every (query, cores) cell runs in its OWN subprocess (the
scaling probe's r6 isolation lesson — shared JVMs pollute later
measurements) with master=local[cores] via SPARK_GRAFT_CPUS and the
shuffle-partition ceiling HELD at 128 for every cell, so the physical
plan and partition count are identical across the row and only the
worker pool varies — pure strong scaling, not a re-plan. Each cell is
min-of-2 after an sf0.01 warmup that absorbs codegen/JIT compile.

Input layout matters as much as the plan: the scaling probe's shared
×10 dir writes ~11 part files per fact table, which under the default
128 MB maxPartitionBytes coalesces to 1-2 SCAN splits — every scan
stage would serialize onto 2 threads and the probe would measure the
fixture's file count, not the plans (a first run did exactly that:
q1 flat at ~1s from 8 threads up). A 100 TB lake table has thousands
of row groups, so scan-split abundance is the one resource a local
probe must emulate, never inherit from a toy fixture: this probe
stages its own ×10 copy repartitioned to 64 files per fact table and
sizes maxPartitionBytes/openCostInBytes so each file is its own split
(64-way scans, still far below the 128 shuffle fan-out).

Self-calibration: textbook efficiency (t4·4 / tN·N) presumes the
machine actually delivers N independent cores. This box does not —
it is a shared VM where a PURE-COMPUTE 128-task job (range →
aggregate fold, no IO, no shuffle data) speeds up only ~4× from
local[4] to local[32] (warmed, e.g. 5.3 → 2.9 → 1.9 → 1.3 s), an
8×-threads-for-4×-speedup hypervisor ceiling. So the
probe measures that calibration job in the same sweep and reports
each query's speedup AS A FRACTION OF the machine's deliverable
speedup at the same thread count: 1.0 means the plan extracted every
cycle the box had to give (fully parallel — no serial section, no
driver bottleneck, no straggler partition); well below 1.0 means the
PLAN left available parallelism unused. Absolute efficiency numbers
from a contended VM would indict the plans for the hypervisor's
sins — the ratio to calibration is the portable signal.

    python scripts/strong_scaling.py          # writes CORES.md
    python scripts/strong_scaling.py --cell q05 8   # child mode

NEVER run other Spark work concurrently (CLAUDE.md probe trap): the
tier timings are only meaningful if the probe owns the box.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CORES = [4, 8, 16, 32]

# One representative per plan family, chosen where the ×10 tier gives
# real headroom over the job-scheduling floor (strong scaling of a
# 0.3s query measures the scheduler, not the plan):
#   q1  — single-scan codegen aggregate (scan-bandwidth bound)
#   q05 — broadcast-star join + two-level aggregate
#   q21 — shuffle-window decorrelated EXISTS/NOT-EXISTS
#   dedup_minhash   — sig-level LSH band self-join (the near-dup family)
#   tokenize_to_ids — explode-heavy text pipeline (vocab + encode)
#   triangle_count  — compute-dense graph kernel (cache re-reads,
#                     array_intersect per edge; byte-light, FLOP-heavy)
QUERIES = [
    "q1_pricing_summary",
    "q05",
    "q21_waiting_supplier",
    "dedup_minhash",
    "tokenize_to_ids",
    "triangle_count",
]

# ×100 strong-scaling set: strong scaling is input-size-dependent
# (Amdahl: the serial floor — job scheduling, broadcast builds, AQE
# stage rounds — is fixed while parallel work grows with data), so the
# ×10 table alone would understate the plans. These run at the probe's
# ×100 tier (~60M lineitem rows / ~500k docs), single cold run per
# cell (each cell is minutes; rep noise is proportionally small) —
# the LLM-pipeline headliners a 100 TB training-data run executes.
X100_SET = [
    "q05",
    "dedup_minhash",
    "tokenize_to_ids",
    "lang_id_ngram",
    "corpus_prep_pipeline",
    "knn_lsh",
    "fuzzy_decontaminate",
    # r7 (VERDICT r06 #5): the relational headliners a 100×-cluster
    # capacity plan would read, plus the q01 pair generator (#2) and
    # the sketch twin — ≥12 queries at the compute-dominated tier.
    "q3_shipping_priority",
    "q9_product_type_profit",
    "q25",
    "hll_distinct_portable",
    "q01_copurchase",
    # r11 (VERDICT r10 #4): every remaining ×100-measured query whose
    # CAPACITY.md of-ceiling column was "—" (provisioned core-h/TB was
    # incomputable for them), plus q21 — its old 0.28 came from the
    # floor-dominated ×10 table and the r11 exchange-reuse rewrite
    # needs the compute-dominated number.
    "q21_waiting_supplier",
    "benchmark_decontaminate",
    "dedup_simhash",
    "embedding_dedup_clusters",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q26",
    "knn_ivf_portable",
    "knn_pq_portable",
    "knn_ivf_persisted",
    "bpe_encode_fixed",
    "bpe_train_merges",
    "duplicate_span_report",
    "kmeans_lloyd_exact",
    "sequence_packing",
]


STAGE_CPU = "/tmp/spark_graft_cpu_x10"
_SPLIT_FILES = 64  # part-files per fact table in the CPU staging

# each staged file ≈ its own scan split (files are ~0.1-1.6 MB; the
# default 4 MB openCost + 128 MB maxPartitionBytes would coalesce all
# 64 back into ~3 splits and serialize every scan stage)
_SPLIT_CONF = {
    "spark.sql.files.maxPartitionBytes": "4m",
    "spark.sql.files.openCostInBytes": "524288",
}


def _ensure_cpu_staged() -> None:
    """Stage the ×10 tier repartitioned to _SPLIT_FILES files per fact
    table (content identical to the scaling probe's tier; only the file
    layout — and therefore scan-split abundance — differs)."""
    import shutil

    from hpat_jl_spark.session import get_spark
    from scaling_probe import _amplified, _DIM_TABLES, REPLICAS

    # Completeness marker written LAST (ADVICE r06: keying the skip on
    # lineitem.parquet — the FIRST table written — silently reused a
    # killed staging run; scaling_probe's _ensure_staged fixed the same
    # bug with a .staged marker).
    if os.path.isfile(os.path.join(STAGE_CPU, ".staged")):
        return
    shutil.rmtree(STAGE_CPU, ignore_errors=True)
    spark = get_spark(app_name="strong-scaling-stage", shuffle_partitions=128)
    for name in ["lineitem", "orders", "customer", "part", "supplier",
                 "nation", "region", "events", "documents", "embeddings"]:
        n = 1 if name in _DIM_TABLES else REPLICAS
        parts = [_amplified(spark, "/root/testdata/sf0.1", name, i) for i in range(n)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if name not in _DIM_TABLES:
            out = out.repartition(_SPLIT_FILES)
        out.write.mode("overwrite").parquet(f"{STAGE_CPU}/{name}.parquet")
    spark.stop()
    with open(os.path.join(STAGE_CPU, ".staged"), "w") as fh:
        fh.write("ok\n")
    print(f"# staged {STAGE_CPU}", file=sys.stderr)


_CALIBRATION = "_pure_compute"


def _calibration_fn(spark, fold: int):
    """128 identical CPU-only tasks: the machine's deliverable-speedup
    yardstick (no IO, no shuffle payload — anything this job loses to
    contention is the hypervisor's, not a plan's). ``fold`` sizes the
    per-task slab so the yardstick's runtime is comparable to the
    tier's queries."""
    return spark.range(0, 128, 1, 128).selectExpr(
        "id",
        f"aggregate(sequence(1, {fold}), 0L, (a, x) -> a + (x * 37) % 1000003) v",
    ).agg({"v": "sum"})


def _run_cell(name: str, cores: int, tier: str) -> None:
    """Child: time one query under local[cores] at the given tier."""
    from hpat_jl_spark import registry
    from hpat_jl_spark.session import get_spark

    x100 = tier == "x100"
    spark = get_spark(
        app_name=f"strong-{name}-{cores}-{tier}",
        shuffle_partitions=128,
        extra_conf=_SPLIT_CONF,
    )
    reps = 1 if x100 else 2  # ×100 cells are minutes: single cold run
    if name == _CALIBRATION:
        fold = 10_000_000 if x100 else 3_000_000
        _calibration_fn(spark, 300_000).collect()  # warm codegen only
        best = None
        for _ in range(max(reps, 2)):
            t0 = time.perf_counter()
            _calibration_fn(spark, fold).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
    else:
        registry.load_all_plans()
        fn = registry.REGISTRY[name].fn
        # warmup at sf0.01: codegen/JIT compile, parquet footer reads
        fn(spark, "/root/testdata/sf0.01").write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        from scaling_probe import STAGE_X100

        data = STAGE_X100 if x100 else STAGE_CPU
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, data).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    print(json.dumps({"name": name, "cores": cores, "sec": round(best, 2)}))


def _child(name: str, cores: int, tier: str = "x10") -> float:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    if tier == "x100":
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")  # CLAUDE.md ×100 trap
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cell", name,
         str(cores), tier],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    for ln in reversed(proc.stdout.strip().splitlines()):
        if ln.strip().startswith("{"):
            return json.loads(ln)["sec"]
    raise RuntimeError(
        f"cell ({name},{cores}) produced no JSON (rc={proc.returncode}): "
        f"{proc.stderr[-500:]}"
    )


CORES_JSON = os.path.join(REPO, "CORES.json")


def _load_cores_json() -> dict:
    try:
        with open(CORES_JSON) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _cell_parts(raw) -> tuple[float, float | None]:
    """(sec, same-run calibration sec or None for legacy cells)."""
    if isinstance(raw, dict):
        return raw["sec"], raw.get("calib")
    return raw, None


def _has_legacy_cells(tier_prior: dict, names: list[str]) -> bool:
    """True when any committed cell for these queries is a bare number
    (pre-r12: no same-run calibration snapshot). While one exists, the
    tier's persisted _pure_compute row is FROZEN — those cells fall
    back to it, so overwriting it re-normalizes them against a
    different box epoch (see _sweep docstring)."""
    return any(
        str(c) in tier_prior.get(name, {})
        and not isinstance(tier_prior[name][str(c)], dict)
        for name in names
        for c in CORES
    )


def _sweep(names: list[str], tier: str) -> dict[str, dict[int, tuple]]:
    """Per-cell resume via CORES.json (r11 — the probe had no artifact,
    so extending the query set re-measured EVERY cell; now committed
    cells are reused and only missing ones run). Invalidate a changed
    plan's row by deleting it from CORES.json (or the whole file for a
    full refresh) — the graph_scaling staleness lesson applies: resumed
    cells are only valid while the plan is unchanged.

    Calibration mixing (ADVICE r11): resuming the CALIBRATION row while
    measuring new query cells normalized fresh timings against a
    yardstick from an earlier run's box conditions. Now (1) whenever any
    query cell must run, the calibration row is RE-MEASURED fresh for
    this invocation (never resumed), and (2) every query cell stores the
    same-run calibration sec at its core count ({"sec": s, "calib": c}),
    so the of-ceiling math normalizes each cell against its OWN run's
    yardstick — rows whose cells span runs stay comparable. Legacy
    numeric cells (pre-r12) carry no snapshot and fall back to the
    tier's COMMITTED calibration row — which is therefore FROZEN
    (late-r12 fix): while any snapshot-less cell remains in the tier,
    a fresh invocation must NOT overwrite _pure_compute in CORES.json
    or the legacy fallback silently re-normalizes those cells against
    a different box epoch (observed: one re-measured query on a
    degraded hypervisor day rewrote the row 3.62 → 11.81 s@32thr and
    every legacy of-ceiling inflated ~3×, q21 0.46 → 1.34). The fresh
    calibration still runs and is what THIS run's new cells snapshot;
    only the persisted/displayed row is pinned to the epoch the legacy
    cells were measured on."""
    prior = _load_cores_json()
    tier_prior = prior.get(tier, {})
    any_missing = any(
        str(c) not in tier_prior.get(name, {}) for name in names for c in CORES
    )
    legacy_in_tier = _has_legacy_cells(tier_prior, names)
    results: dict[str, dict[int, tuple]] = {}

    calib: dict[int, float] = {}
    seeded_calib = tier_prior.get(_CALIBRATION, {})
    for c in CORES:
        if not any_missing and str(c) in seeded_calib:
            calib[c], _ = _cell_parts(seeded_calib[str(c)])
            continue
        calib[c] = _child(_CALIBRATION, c, tier)
        print(f"# [{tier}] {_CALIBRATION} @ local[{c}]: {calib[c]}s",
              file=sys.stderr)
        if legacy_in_tier and str(c) in seeded_calib:
            continue  # frozen: legacy cells normalize against this row
        prior = _load_cores_json()
        prior.setdefault(tier, {}).setdefault(_CALIBRATION, {})[str(c)] = (
            calib[c]
        )
        with open(CORES_JSON, "w") as fh:
            json.dump(prior, fh, indent=1)
    if legacy_in_tier and seeded_calib:
        display = {
            c: (_cell_parts(seeded_calib[str(c)])[0]
                if str(c) in seeded_calib else calib[c])
            for c in CORES
        }
    else:
        display = dict(calib)
    results[_CALIBRATION] = {c: (display[c], display[c]) for c in CORES}

    for name in names:
        seeded = tier_prior.get(name, {})
        results[name] = {}
        dirty = False
        for c in CORES:
            if str(c) in seeded:
                results[name][c] = _cell_parts(seeded[str(c)])
                continue
            sec = _child(name, c, tier)
            results[name][c] = (sec, calib[c])
            dirty = True
            print(f"# [{tier}] {name} @ local[{c}]: {sec}s", file=sys.stderr)
            prior = _load_cores_json()
            prior.setdefault(tier, {}).setdefault(name, {})[str(c)] = {
                "sec": sec, "calib": calib[c],
            }
            with open(CORES_JSON, "w") as fh:
                json.dump(prior, fh, indent=1)
        if not dirty:
            print(f"# [{tier}] {name}: resumed from CORES.json",
                  file=sys.stderr)
    return results


def _table(results: dict[str, dict[int, tuple]]) -> list[str]:
    base, top = CORES[0], CORES[-1]
    calib = {c: v[0] for c, v in results[_CALIBRATION].items()}
    lines = [
        "| query | local[4] (s) | local[8] (s) | local[16] (s) | local[32] (s) | speedup 4→32 | of ceiling |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        sp = r[base][0] / max(r[top][0], 1e-9)
        label = "machine ceiling (pure compute)" if name == _CALIBRATION else name
        if name == _CALIBRATION:
            of_ceiling = "—"
        else:
            # normalize each endpoint cell against ITS run's calibration
            # (legacy cells without a snapshot use this run's yardstick)
            norm_b = r[base][0] / (r[base][1] or calib[base])
            norm_t = r[top][0] / (r[top][1] or calib[top])
            of_ceiling = f"{norm_b / max(norm_t, 1e-9):.2f}"
        lines.append(
            "| " + label + " | "
            + " | ".join(f"{r[c][0]}" for c in CORES)
            + f" | {sp:.1f}× | {of_ceiling} |"
        )
    return lines


def main() -> None:
    _ensure_cpu_staged()
    from scaling_probe import _ensure_staged

    _ensure_staged()  # the ×100 table reads the probe's staged tier
    res_x10 = _sweep(QUERIES, "x10")
    res_x100 = _sweep(X100_SET, "x100")

    lines = [
        "# CORES — strong scaling (fixed data, 4→32 threads)",
        "",
        "Generated by `python scripts/strong_scaling.py`. Fixed input per",
        "table, master=local[N] varying only the worker pool. Table 1's",
        "input is the ×10 tier (~6M lineitem rows / ~50k docs) staged",
        "split-rich: 64",
        "part-files per fact table with maxPartitionBytes sized so every",
        "file is its own scan split (the shared probe tier's ~11-file",
        "layout coalesces to 1-2 scan splits under the 128 MB default and",
        "serializes every scan stage — a first run measured the file",
        "count, not the plans; a 100 TB lake table has thousands of row",
        "groups, so split abundance is the one resource a local probe must",
        "emulate, never inherit from a toy fixture). The shuffle-partition",
        "ceiling is held at 128 for every cell — identical physical plans.",
        "Every cell is its own subprocess (fresh JVM), min-of-2 after an",
        "sf0.01 codegen warmup.",
        "",
        "**Read this table against the calibration row, not against an",
        "ideal-linear fantasy.** The first row is a PURE-COMPUTE 128-task",
        "job (range → integer fold, no IO, no shuffle payload): whatever",
        "speedup it fails to achieve is the machine's — this is a shared",
        "VM whose hypervisor delivers only a fraction of its 32 advertised",
        "threads under full fan-out. `of ceiling` = query speedup 4→32",
        "divided by the calibration's speedup 4→32: ~1.0 means the plan",
        "extracted every cycle the box had to give (no serial section, no",
        "driver bottleneck, no straggler partition); well below 1.0 means",
        "the plan itself left parallelism unused (fixed job/stage floor,",
        "broadcast builds, or a stage with fewer tasks than threads).",
        "On a real cluster the calibration ceiling moves to ~N (each",
        "executor brings its own memory channels and scheduler); the",
        "of-ceiling fraction is the part that transfers. Since r12 each",
        "cell stores the SAME-RUN calibration time at its core count and",
        "of-ceiling is computed from calibration-normalized endpoints, so",
        "resumed cells from different runs never mix yardsticks (ADVICE",
        "r11); pre-r12 cells without a snapshot fall back to the current",
        "calibration row.",
        "",
        "**Strong scaling is input-size-dependent (Amdahl).** At the ×10",
        "tier most queries carry ~1 core-second of parallel work against a",
        "~0.5 s serial floor (driver/py4j, job scheduling, broadcast",
        "builds, AQE stage rounds), so their of-ceiling fractions are low",
        "BY CONSTRUCTION of the input size, not because the plans",
        "serialize. Table 2 re-measures the heavy pipeline queries at the",
        "×100 tier (~60M lineitem rows / ~500k docs, single cold run per",
        "cell), where parallel work dominates the floor — the of-ceiling",
        "fraction RISING with input size is the signature of a fixed",
        "serial floor plus parallel data work, i.e. exactly the profile",
        "that scales out on a real cluster (at 100 TB the floor is noise).",
        "",
        "## Table 1 — ×10 tier (floor-dominated regime)",
        "",
        *_table(res_x10),
        "",
        "## Table 2 — ×100 tier (compute-dominated regime)",
        "",
        *_table(res_x100),
        "",
        "Per-query notes (r7 run): q01_copurchase measures 1.00 of",
        "ceiling — the pinned-fan-out self-join rewrite (VERDICT r06 #2)",
        "is pure data-parallel pair generation with no serial section;",
        "its ×10/×100 SCALING rows (4.3×/decade) complete the floor",
        "analysis the verdict asked for. hll_distinct_portable measures",
        "ABOVE the pure-compute calibration (≈1.2): the 4-thread cell",
        "pays md5+distinct hash-map pressure against a shared L3 that",
        "the 32-thread cell amortizes across more concurrent maps —",
        "superlinear-vs-calibration is a cache artifact of this VM, read",
        "it as 'scales at least as well as pure compute'. The classic",
        "relational headliners (q3 0.47, q9 0.61, q25 0.54, q05 0.48)",
        "all sit at ~half the machine ceiling at ×100, their remaining",
        "gap being scan-split scarcity (single-file fixture tables) and",
        "the per-stage AQE/broadcast rounds that a multi-executor",
        "cluster overlaps. fuzzy_decontaminate (0.6-0.7 of ceiling) —",
        "banded candidate generation plus verify join",
        "is almost pure data-parallel work. corpus_prep_pipeline stays",
        "floor-bound even at ×100 BY DESIGN: its first stage is exact",
        "dedup, which collapses the tier's 100-way verbatim replicas to",
        "the ~5k distinct survivors, so every downstream stage (quality",
        "gate → near-dup → decontaminate → tokenize → pack) does ×1 work",
        "however much the corpus is replicated — the pipeline's whole",
        "point; its low fraction is the multi-stage job floor over a",
        "collapsed stream, not a serial section (SCALING.md shows the",
        "same signature: ×10→×100 growth 1.0×).",
        "",
        "r12 anomaly resolution (VERDICT r11 #1): the r11 table recorded",
        "two INVERSE-scaling rows at ×100 — embedding_dedup_clusters",
        "17.6 s@4thr → 55.4 s@32thr (of-ceiling 0.08) and",
        "q10_returned_items 12.8 s@8thr → 33.8 s@32thr (0.14). The",
        "COLLAPSE did not reproduce: re-measuring the exact cells on an",
        "idle box gave 17.3-17.6 s and 9.3 s at local[32] (3.2× and 3.6×",
        "faster than the committed cells) — those r11 cells were the",
        "chronologically-late measurements of a multi-hour sweep on this",
        "shared VM (cells run in ascending core order, so 16/32-thread",
        "cells land last), i.e. run-order box contention, not thread",
        "count. On re-measure q10_returned_items is cleanly monotone",
        "(16.9 → 9.3 s, of-ceiling 0.41 — the textbook fact⋈fact +",
        "broadcast-nation shape it always was). embedding_dedup_clusters",
        "re-measures FLAT (13.1 → 17.6 s), which the per-stage profiles",
        "explain as a genuine structural bound, not a plan defect: the",
        "steady-state run is ~8-9 core-s of ideal-parallel work at EITHER",
        "width inside a ~13 s wall of 62 jobs/115 stages — the connected-",
        "components fixpoint's sequential sub-second driver rounds are",
        "the floor — and the per-task executorRunTime inflates 35 → 259",
        "core-s from 4 → 32 threads (7.4×) because the array-heavy gram/",
        "CC stages saturate this box's shared memory bandwidth well below",
        "32 threads. A real cluster hits neither: each executor brings",
        "its own memory channels, and at 100 TB the per-round parallel",
        "work dwarfs the fixed ~50-job round floor (SCALING.md's data-",
        "growth rows for this query are healthy — the floor amortizes",
        "with input, threads don't change it). The per-cell calibration",
        "snapshot (above) now pins every cell to its own run's yardstick",
        "so a contended stretch shows up in the calibration row instead",
        "of silently inverting a query's fraction.",
        "",
        "late-r12 re-measure: embedding_dedup_clusters' cells were re-run",
        "after its CC fixpoint was REMOVED outright — every SemDeDup edge",
        "(gram pair or rep→copy star) is label-bucket-local by",
        "construction, so the components decompose per bucket and one",
        "Arrow union-find kernel (operators/iterative.",
        "bucketed_components) replaces the ~20 one-action propagation",
        "rounds that had profiled as the structural wall. ×100 probe wall",
        "14.94 → 5.14 s, sf0.1 jobs 49 → 11 across the two rewrites. The",
        "row is now FLAT at ~6-7.4 s across every width (of-ceiling",
        "0.20): what remains is the fixed multi-job floor (persist fill,",
        "gram kernel, union-find, final agg — Python-worker and Arrow",
        "startup included) plus kernel stages whose parallelism the",
        "FIXTURE caps at its 8 label buckets — at 100 TB the bucket",
        "count (IVF cells / LSH bands) exceeds any core count, and the",
        "floor amortizes with input (SCALING growth 1.5×/2.1× per",
        "decade). Its calib snapshots also record how chaotic the",
        "measurement epoch was (25.3 s@4thr against a committed 16.1) —",
        "per-cell normalization charges that to the calibration column,",
        "which is exactly its job.",
        "",
        "SCALING.md (data tiers) and SHUFFLE.md (byte volumes) are the",
        "companion axes; all three are regenerated by their scripts with",
        "the box otherwise idle (run-to-run noise on this VM is 1.5-2×,",
        "so treat single-cell wiggles as noise and the calibration-",
        "relative fractions as the signal).",
        "",
    ]
    with open(os.path.join(REPO, "CORES.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote CORES.md")


if __name__ == "__main__":
    if "--cell" in sys.argv:
        i = sys.argv.index("--cell")
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        tier = sys.argv[i + 3] if len(sys.argv) > i + 3 else "x10"
        _run_cell(sys.argv[i + 1], int(sys.argv[i + 2]), tier)
    else:
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        main()
