"""Set operations — new surface (SURVEY §2.6: the reference has only
vcat/UNION ALL; intersect/except/distinct are 'not present'). All are
built-in shuffles in Spark; wrappers exist so the HPAT-style API is
complete in one namespace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def distinct_rows(t: DataFrame) -> DataFrame:
    """Whole-row distinct (hash aggregate on all columns)."""
    return t.distinct()


def intersect(t1: DataFrame, t2: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return t1.intersectAll(t2) if keep_duplicates else t1.intersect(t2)


def except_rows(t1: DataFrame, t2: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    return t1.exceptAll(t2) if keep_duplicates else t1.subtract(t2)
