"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic partition-parallel row generator.

The reference's only "source" is a reflected RDBMS table
(subsetter.py::Db.__init__); Spark's DataSource API is the extension
point for everything else — feature stores, internal services, synthetic
benchmark data.  ``RangeGenDataSource`` is the minimal complete example:
N partitions, each generating its own id range executor-side (no driver
materialization, no shuffle — parallelism comes from ``partitions()``),
with a pure-integer/IEEE value formula so a SQL oracle can reproduce the
output bit-exactly on another engine.

Registered under the short name ``rangegen``:

    spark.dataSource.register(RangeGenDataSource)
    spark.read.format("rangegen")
         .option("partitions", 8).option("rowsPerPartition", 1000).load()

Scale contract: rows are generated lazily per partition (a generator,
never a list), so memory is O(1) per task and total throughput scales
linearly with executors; the Arrow batch path batches rows JVM-side.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class RangeGenDataSource(DataSource):
    """Deterministic synthetic rows: id, owning partition, and a value
    from a pure-integer formula (``(id*7 % 1000) / 8`` — exact in IEEE
    double, so cross-engine reproducible; no transcendentals)."""

    @classmethod
    def name(cls) -> str:
        return "rangegen"

    def schema(self) -> str:
        return "id BIGINT, part INT, val DOUBLE"

    def reader(self, schema) -> "RangeGenReader":
        return RangeGenReader(self.options)

    def simpleStreamReader(self, schema) -> "RangeGenStreamReader":
        return RangeGenStreamReader(self.options)


class RangeGenReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows_per_partition = int(options.get("rowsperpartition", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        base = partition.value * self.rows_per_partition
        for k in range(self.rows_per_partition):
            idx = base + k
            yield (idx, partition.value, (idx * 7 % 1000) / 8.0)


class RangeGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor of the same deterministic generator (Spark 4
    ``simpleStreamReader``): each micro-batch advances a monotone row
    offset by ``rowsPerBatch`` until ``maxRows`` — the minimal complete
    example of a custom Python STREAMING source (an internal feed, a
    service poller).  Offsets are plain dicts, so restart/replay
    (``readBetweenOffsets``) re-generates the identical rows — exactly
    the replayability contract a production source must give the
    checkpoint log.  A bounded replay therefore equals the batch
    generator over [0, maxRows) and the result is DuckDB-checkable.
    """

    def __init__(self, options) -> None:
        self.rows_per_batch = int(options.get("rowsperbatch", 500))
        self.max_rows = int(options.get("maxrows", 5000))
        self.rows_per_partition = int(options.get("rowsperpartition", 1000))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, start: int, end: int) -> list:
        # a LIST, not a generator: the simple-reader prefetcher pickles
        # the batch into its driver-side cache, and the batch is bounded
        # by rows_per_batch so materializing it is O(batch), not O(table)
        return [
            (idx, idx // self.rows_per_partition, (idx * 7 % 1000) / 8.0)
            for idx in range(start, end)
        ]

    def read(self, start: dict):
        lo = start["offset"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        # iter(list), not a bare list or generator: the prefetcher calls
        # next() on it to verify an unadvanced offset is empty, AND
        # pickles the cached batch to ship it to executors — a list
        # iterator satisfies both, a generator neither
        return iter(self._rows(lo, hi)), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["offset"], end["offset"]))
