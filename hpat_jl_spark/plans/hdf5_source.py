"""Driver-gated HDF5 ingest query: the reference's native @h5read
pattern (multiple 1-D datasets composed into one table — reference
src/capture-api.jl:587-635, examples/queries_devel/kmeans.jl) run
end-to-end against this repo's pure-python classic codec
(sources/hdf5) and hash-checked against DuckDB on the ORIGINAL parquet
— so the whole write→scan→split→read chain is inside the correctness
gate, not just unit goldens.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpat_jl_spark.registry import register
from hpat_jl_spark.sources.hdf5 import write_hdf5
from hpat_jl_spark.tables import load_table

# sf_dir → staged .h5 file (fixture re-encoded once per process; the
# bench's min-of-reps and the sweeps reuse it)
_STAGED_H5: dict[str, str] = {}


def _cleanup() -> None:
    for p in _STAGED_H5.values():
        shutil.rmtree(os.path.dirname(p), ignore_errors=True)
    _STAGED_H5.clear()


atexit.register(_cleanup)


def _stage_lineitem_h5(spark: SparkSession, sf_dir: str) -> str:
    """Re-encode (l_orderkey, l_quantity) from the parquet fixture as
    two 1-D datasets in one classic HDF5 file — the reference's
    column-per-dataset layout. Driver-side by design: this builds the
    INPUT a reference user would already have; the distributed part
    under test is the read."""
    key = os.path.abspath(sf_dir)
    cached = _STAGED_H5.get(key)
    if cached and os.path.exists(cached):
        return cached
    li = load_table(spark, "lineitem", sf_dir)
    pdf = li.select("l_orderkey", "l_quantity").orderBy(
        "l_orderkey", "l_linenumber"
    ).toPandas()
    path = os.path.join(tempfile.mkdtemp(prefix="hpat_h5_"), "lineitem.h5")
    write_hdf5(
        path,
        {
            "orderkey": pdf["l_orderkey"].to_numpy("<i8"),
            "quantity": pdf["l_quantity"].to_numpy("<f8"),
        },
    )
    _STAGED_H5[key] = path
    return path


_h5_oracle = """
SELECT l_orderkey % 8 AS bucket,
       count(*)::BIGINT AS n_rows,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem
GROUP BY 1
"""


@register("hdf5_ingest_agg", oracle=_h5_oracle, tags=("source", "hdf5"))
def hdf5_ingest_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → classic HDF5 (column-per-dataset) → ONE distributed
    aligned row-range read of both datasets → aggregate. The reference
    composes @h5read'd arrays by implicit row order; read_hdf5_table
    reproduces that per-split (each task seeks the SAME row range in
    every dataset), so no row_id shuffle join is needed to restore an
    alignment the file already guarantees — the per-column read + join
    variant measured 4.97s at sf0.1, this one 1.2s. The aggregate's
    oracle is DuckDB over the untouched parquet, so any codec/split/
    alignment bug breaks the value hash."""
    from hpat_jl_spark.sources.hdf5 import read_hdf5_table

    path = _stage_lineitem_h5(spark, sf_dir)
    t = read_hdf5_table(spark, path, ["orderkey", "quantity"])
    return (
        t.groupBy((F.col("orderkey") % 8).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("quantity"), 2).alias("total_qty"),
        )
    )
