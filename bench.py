#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query executes end-to-end via the noop writer (full compute, no
driver materialization). A tiny warmup query first, so JVM/codegen
startup isn't billed to the first headline query.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q9_product_type_profit",
    "q21_waiting_supplier",
    "q26",
    "q05",
    "q25",
    "q01_copurchase",
    "asof_join_views",
    "cumsum_per_user",
    "sessionize_events",
    "text_stats",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "knn_bruteforce",
    "knn_lsh",
    "embedding_neardup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None

    from hpat_jl_spark import registry
    from hpat_jl_spark.session import get_spark

    spark = get_spark(app_name="hpat_jl_spark-bench")
    qs = registry.queries()

    # warmup: session + codegen + parquet footer reads
    spark.range(1000).selectExpr("sum(id)").collect()
    qs["filter_select"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
