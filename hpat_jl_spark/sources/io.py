"""Schema'd readers and partitioned writers.

Reference parity (SURVEY §2.1):
- HDF5 source (collective hyperslab reads per rank, reference
  src/cgen-hpat-pattern-match.jl:849-894) → `read_parquet` — Parquet
  row-group splits give each task its byte range, same access pattern.
- TXT source (MPI byte-range read + newline realignment via neighbor
  exchange, reference src/cgen-hpat-pattern-match.jl:895-1046) →
  `read_csv` — Spark's text input format does the split-boundary line
  handling natively.
- HDF5/TXT sinks (collective writes with MPI_Exscan offsets, reference
  src/domain-pass.jl:839-911) → `write_parquet`/`write_csv` — one file
  per task, plus optional hive partitioning / bucketing the reference
  never had.

Schemas are always explicit (reference-style static declaration —
inference is a schema drift hazard at 100 TB and costs a pre-scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema REQUIRED: never infer (inference scans the data twice and
    guesses types per-run)."""
    return spark.read.schema(schema).csv(path, header=header, sep=sep)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    """Parquet sink. ``partition_by`` = hive-style directory partitioning
    (enables partition pruning for downstream readers — pick low-
    cardinality keys; a high-cardinality partition key creates a small-
    files problem at scale)."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line, splittable on read) — for
    interchange with text-pipeline tooling; Parquet remains the
    performance path (JSON re-parses every value on read)."""
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC source — the other splittable columnar lake format (stripe
    boundaries play the row-group role; predicate pushdown and column
    pruning work identically to parquet). Supported so a user whose
    warehouse is Hive/ORC can feed this engine without a conversion
    pass."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw line source (one string column ``value``) — the closest
    Spark twin of the reference's TXT byte-range reader (reference
    src/cgen-hpat-pattern-match.jl:895-1046: MPI byte-range read +
    newline realignment via neighbor exchange; Spark's TextInputFormat
    does the same split-boundary line handling per task). The entry
    point for ingesting raw crawl/text dumps into the documents
    pipeline."""
    return spark.read.text(path)


def write_text_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Line sink: df must have exactly one string column."""
    df.write.mode(mode).text(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files of
    ~``target_file_bytes`` (returns the file count written). The
    standard lake-maintenance pass — streaming sinks and fine-grained
    partitioning accumulate KB-sized files whose per-file open/footer
    cost dominates scans; compaction restores scan bandwidth.

    Sizing: file count = ceil(total_bytes / target); the rewrite is one
    read + round-robin repartition + write (no shuffle key — row order
    within the dataset is not semantic for a lake table; use
    zorder_sort first when range-pruning layout matters)."""
    import math

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    summary = fs.getContentSummary(jvm_path)
    total = summary.getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def schema_diff(
    spark: SparkSession, path_a: str, path_b: str
) -> dict[str, list[str]]:
    """Schema drift detection between two parquet snapshots: returns
    {'added': [...], 'removed': [...], 'retyped': ['col: a -> b']}.
    Reads only footers (no data scan) — the guard a scheduled ingest
    runs before appending a new drop to a 100 TB table."""
    sa = {f.name: f.dataType.simpleString() for f in spark.read.parquet(path_a).schema}
    sb = {f.name: f.dataType.simpleString() for f in spark.read.parquet(path_b).schema}
    return {
        "added": sorted(set(sb) - set(sa)),
        "removed": sorted(set(sa) - set(sb)),
        "retyped": sorted(
            f"{c}: {sa[c]} -> {sb[c]}" for c in set(sa) & set(sb) if sa[c] != sb[c]
        ),
    }
