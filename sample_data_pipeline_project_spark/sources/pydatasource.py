"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic generator table.

The engine's file sources (parquet/csv/json/orc, hive-partitioned
layouts, bucketed tables, snapshots) all read bytes somebody else wrote;
the Python DataSource API is the remaining source surface — Spark 4's
contract for exposing ANY external system as a partitioned, schema'd
table without a JVM connector. This module implements the simplest
instance that still exercises the whole contract (schema declaration,
option passing, partition planning, per-partition iteration):
`det_range`, a splittable deterministic integer generator.

Rows for n rows over p partitions (round-robin by modulo so partitions
are balanced and the split is order-independent):
    id      0..n-1          (partition i owns ids with id % p == i)
    bucket  id % 10
    val     (id * 2654435761) % 1000003   (Knuth multiplicative mix)

Everything is integer arithmetic — the same rows are stated in the
DuckDB oracle from range(n), so the source rides the standard value-hash
gate. At scale the partition count is the parallelism knob: partitions
stream independently on executors (each materializes only its own
residue class), exactly how a production Python source shards an
external API or queue.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class DetRangePartition(InputPartition):
    def __init__(self, index: int, n: int, num_parts: int):
        self.index = index
        self.n = n
        self.num_parts = num_parts


class DetRangeReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100000))
        self.num_parts = int(options.get("partitions", 8))

    def partitions(self):
        return [
            DetRangePartition(i, self.n, self.num_parts)
            for i in range(self.num_parts)
        ]

    def read(self, partition: DetRangePartition):
        for i in range(partition.index, partition.n, partition.num_parts):
            yield (i, i % 10, (i * 2654435761) % 1000003)


class DetRangeSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "det_range"

    def schema(self) -> str:
        return "id BIGINT, bucket BIGINT, val BIGINT"

    def reader(self, schema) -> DetRangeReader:
        return DetRangeReader(self.options)


def _register_idempotent(spark, source_cls) -> None:
    """Register a Python DataSource, tolerating ONLY the already-registered
    duplicate error — any other failure (missing datasource API, broken
    source class) propagates instead of resurfacing later as an opaque
    DATA_SOURCE_NOT_FOUND at .load() time."""
    try:
        spark.dataSource.register(source_cls)
    except Exception as exc:
        # Spark's canonical DATA_SOURCE_ALREADY_EXISTS message is
        # "Data source '<name>' already exists, please use a different
        # name" — match either wording so the guard stays idempotent
        # across Spark versions (4.1.2 silently replaces and never
        # raises; this is forward-compatibility only).
        msg = str(exc).lower()
        if "already exists" in msg or "already registered" in msg:
            return
        raise


def register_det_range(spark) -> None:
    """Idempotently register the source with the session."""
    _register_idempotent(spark, DetRangeSource)


# --------------------------------------------------------------------------
# Streaming variant: SimpleDataSourceStreamReader over the same generator
# --------------------------------------------------------------------------


class DetRangeStreamReader(SimpleDataSourceStreamReader):
    """Chunked micro-batch reads over the deterministic generator: the
    offset is a plain dict {"pos": next_id}; each read() emits one chunk
    and advances the offset; readBetweenOffsets replays any committed
    range exactly (the failure-recovery contract — replay MUST be
    deterministic, which the arithmetic generator gives for free)."""

    def __init__(self, options):
        self.n = int(options.get("n", 30000))
        self.chunk = int(options.get("chunk", 10000))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, lo: int, hi: int):
        return iter(
            [(i, i % 10, (i * 2654435761) % 1000003) for i in range(lo, hi)]
        )

    def read(self, start):
        pos = int(start["pos"])
        end = min(pos + self.chunk, self.n)
        return (self._rows(pos, end), {"pos": end})

    def readBetweenOffsets(self, start, end):
        return self._rows(int(start["pos"]), int(end["pos"]))


class DetRangeStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "det_range_stream"

    def schema(self) -> str:
        return "id BIGINT, bucket BIGINT, val BIGINT"

    def simpleStreamReader(self, schema) -> DetRangeStreamReader:
        return DetRangeStreamReader(self.options)


def register_det_range_stream(spark) -> None:
    """Idempotently register the streaming source with the session."""
    _register_idempotent(spark, DetRangeStreamSource)
