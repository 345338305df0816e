"""Sources & sinks (SURVEY §2.1): the reference's HDF5/TXT parallel I/O
re-expressed as Spark's splittable columnar/text readers and writers.
"""

from hpat_jl_spark.sources.io import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_parquet,
)
