"""Local replica of the driver's correctness gate: run a registered
Spark plan and its DuckDB oracle side-by-side and compare row count,
schema (column names) and order-insensitive values — so `pytest` catches
an oracle mismatch before the driver does.

Exactness (VERDICT r08 #2): the driver's gate is a VALUE HASH — any
bit-visible float divergence fails it. The old `rel_tol=1e-7` compare
could not certify that (one cent on a 6-digit value is 1.5e-8 —
invisible to the tolerant compare, fatal to the hash; q11 hid there
for 7 rounds). Float columns now compare EXACTLY (== with NaN==NaN)
by default; the tolerant path survives only for columns a query
explicitly tags ``float_tol`` in its registration — raw unquantized
floats whose oracle is genuinely tolerant (and which the driver gate
may therefore flag; every tag is a documented risk, not a default).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from hpat_jl_spark.tables import TABLE_NAMES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        if os.path.isdir(path):
            # Spark-written table (e.g. the staged scale tiers): a
            # directory of part files — glob it for DuckDB.
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame, float_tol: tuple[str, ...] = ()) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]) and c in float_tol:
            # tolerant columns only: quantize so near-equal values sort
            # into the same row order on both sides
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare_frames(
    actual: pd.DataFrame,
    expected: pd.DataFrame,
    float_tol: tuple[str, ...] = (),
) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(actual.columns) != sorted(expected.columns):
        problems.append(
            f"columns differ: spark={sorted(actual.columns)} "
            f"oracle={sorted(expected.columns)}"
        )
        return problems
    # dtype KIND must align (int vs float): DuckDB materializes integer
    # sums as HUGEINT→float64, which survives a value-tolerant local
    # compare but can break a strict driver-side value hash (1 vs 1.0)
    for c in actual.columns:
        ka = actual[c].dtype.kind
        ke = expected[c].dtype.kind
        if {ka, ke} == {"i", "f"}:
            problems.append(
                f"column {c!r} dtype kind differs: spark={actual[c].dtype} "
                f"oracle={expected[c].dtype} — cast the oracle (::BIGINT) "
                f"or the Spark column so both sides agree"
            )
    if problems:
        return problems
    if len(actual) != len(expected):
        problems.append(f"row count differs: spark={len(actual)} oracle={len(expected)}")
        return problems
    a, e = _canon(actual, float_tol), _canon(expected, float_tol)
    for c in a.columns:
        av, ev = a[c], e[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(ev):
            tolerant = c in float_tol
            bad = 0
            worst = 0.0
            for x, y in zip(av.astype(float), ev.astype(float)):
                both_nan = (isinstance(x, float) and math.isnan(x)) and (
                    isinstance(y, float) and math.isnan(y)
                )
                if both_nan:
                    continue
                if tolerant:
                    if not math.isclose(x, y, rel_tol=1e-7, abs_tol=1e-7):
                        bad += 1
                        worst = max(worst, abs(x - y))
                elif x != y:
                    bad += 1
                    worst = max(worst, abs(x - y))
            if bad:
                mode = "tolerant" if tolerant else "exact"
                problems.append(
                    f"column {c!r}: {bad} differing values "
                    f"({mode} float compare, max abs diff {worst:.3g})"
                )
        else:
            if not av.astype(str).equals(ev.astype(str)):
                diffs = (av.astype(str) != ev.astype(str)).sum()
                problems.append(f"column {c!r}: {diffs} differing values")
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    """Run registered query `name` against its oracle at sf_dir."""
    from hpat_jl_spark import registry

    registry.load_all_plans()
    spec = registry.REGISTRY[name]
    actual = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return [] if len(actual) >= 0 else ["no result"]
    con = duckdb_con(sf_dir)
    expected = con.execute(spec.oracle).df()
    return compare_frames(actual, expected, float_tol=spec.float_tol)
