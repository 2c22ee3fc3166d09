"""Uniform multi-format source/sink API (parquet / csv / json-lines).

The reference's only IO is a Snowflake table; the Spark-first engine reads
and writes open formats. One pair of functions with the format-specific
sharp edges handled centrally:

  - csv/json carry no (or weak) embedded schema -> an explicit StructType
    is REQUIRED on read (schema-on-read; inference is a silent-corruption
    vector and a full extra pass at 100 TB).
  - timestamps are written tz-less (ISO) and read back as the declared
    NTZ type, keeping the engine's timezone-free contract across formats.
  - writers can partition by columns (hive-style dirs) and cap file count
    per partition — the same small-files guard as ledger_io.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMATS = ("parquet", "orc", "csv", "json")

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Schema-on-read load. Text formats (csv/json) require `schema`."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt not in ("parquet", "orc"):
        raise ValueError(f"{fmt} has no reliable embedded schema; pass one")
    # FAILFAST: a row that doesn't parse under the declared schema is an
    # error at the read boundary, not a silent null downstream (the
    # default PERMISSIVE mode swallows corruption).
    if fmt == "csv":
        return reader.options(
            header=True, timestampNTZFormat=_TS_FMT, mode="FAILFAST"
        ).csv(path)
    if fmt == "json":
        return reader.options(timestampNTZFormat=_TS_FMT, mode="FAILFAST").json(path)
    if fmt == "orc":
        return reader.orc(path)
    return reader.parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    files_per_partition: int | None = None,
) -> None:
    """Write in any supported format, optionally hive-partitioned."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {_FORMATS}")
    out = df
    if files_per_partition is not None:
        out = (
            df.repartition(files_per_partition, *partition_by)
            if partition_by
            else df.coalesce(files_per_partition)
        )
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.options(header=True, timestampNTZFormat=_TS_FMT).csv(path)
    elif fmt == "json":
        writer.option("timestampNTZFormat", _TS_FMT).json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        writer.parquet(path)
