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
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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
    """Arrow-batched reader: ``read`` yields ``pyarrow.RecordBatch``es
    built with numpy vector arithmetic, not per-row Python tuples.  The
    Python DataSource API ships RecordBatches across the boundary
    zero-copy (Arrow IPC), so this is the read twin of the
    ``DataSourceArrowWriter`` below — the row-yielding form would pickle
    every tuple individually (the last row-at-a-time boundary this repo
    had).  Batches are capped at ``ARROW_BATCH_ROWS`` so task memory
    stays O(batch) regardless of partition size."""

    ARROW_BATCH_ROWS = 65536

    def __init__(self, options) -> None:
        self.rows_per_partition = int(options.get("rowsperpartition", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        import numpy as np
        import pyarrow as pa

        base = partition.value * self.rows_per_partition
        for lo in range(0, self.rows_per_partition, self.ARROW_BATCH_ROWS):
            hi = min(lo + self.ARROW_BATCH_ROWS, self.rows_per_partition)
            idx = np.arange(base + lo, base + hi, dtype=np.int64)
            # same pure-integer formula as the row form: (id*7 % 1000)/8
            # is exact in IEEE double, so output is bit-identical
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(idx, type=pa.int64()),
                    pa.array(
                        np.full(hi - lo, partition.value, dtype=np.int32),
                        type=pa.int32(),
                    ),
                    pa.array((idx * 7 % 1000) / 8.0, type=pa.float64()),
                ],
                names=["id", "part", "val"],
            )


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


# ---------------------------------------------------------------------------
# Python DataSource WRITER (the write half of the Spark 4 API; the
# reference's sink is a live RDBMS — subsetter.py::Db.create_row_in —
# this is the extension point for everything Spark lacks a connector
# for: feature stores, internal services, bespoke file layouts)
# ---------------------------------------------------------------------------


class _FileCommitMessage(WriterCommitMessage):
    """One data file written by one task: path + row count.  Collected
    by the driver at commit time — the two-phase protocol that makes
    the sink atomic (only committed files enter the manifest; aborted
    or speculative task output is never referenced)."""

    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class JsonlSinkDataSource(DataSource):
    """``jsonlsink``: partition-parallel JSON-lines sink with a commit
    manifest.  Each task streams its partition to ONE uniquely named
    ``part-<uuid>.jsonl`` under ``path`` (O(1) task memory — rows are
    written as they arrive, never buffered); the driver's ``commit``
    writes ``_manifest.json`` listing exactly the committed files and
    their row counts.  Readers that honor the manifest get atomic
    visibility: a crashed/speculative task's orphan file is simply
    absent from it.  This is the same task-commit/job-commit split
    Spark's built-in file sinks use, expressed through the Python
    DataSource write API.

    Limitations (by design — this is a single-filesystem sink):
    ``path`` must be a filesystem visible to driver AND executors
    identically (local/NFS; local-mode always qualifies), and
    ``mode('overwrite')`` is not atomic — the previous generation is
    removed before the new write starts, so a failed overwrite leaves
    the directory without a manifest (readers fail loudly rather than
    see mixed generations)."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options, schema, overwrite)


class JsonlWriter(DataSourceArrowWriter):
    """Arrow-batched task writer: Spark hands each task an iterator of
    pyarrow RecordBatches (vectorized boundary transfer — the Python
    DataSource equivalent of a Pandas UDF vs a row-at-a-time UDF; the
    plain ``DataSourceWriter`` would pickle every Row across the
    boundary individually).  Output bytes are identical to the
    row-based form: one sorted-keys json object per line."""

    def __init__(self, options, schema, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires .option('path', <dir>)")
        self.fields = [f.name for f in schema.fields]
        # the writer is CONSTRUCTED on the driver (then pickled to
        # tasks), so mode('overwrite') cleanup belongs here — before
        # any task writes
        if overwrite:
            import glob
            import os

            for f in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.remove(f)
            m = os.path.join(self.path, "_manifest.json")
            if os.path.exists(m):
                os.remove(m)

    @staticmethod
    def _json_default(v):
        """Serializer for non-JSON-native Arrow types so the sink is a
        real general-purpose extension point, not primitives-only:
        datetime/date -> ISO-8601 strings, Decimal -> str (lossless),
        bytes -> base64.  Deterministic per value, so output stays
        byte-reproducible."""
        import base64
        import datetime
        import decimal

        if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
            return v.isoformat()
        if isinstance(v, decimal.Decimal):
            return str(v)
        if isinstance(v, (bytes, bytearray)):
            return base64.b64encode(bytes(v)).decode("ascii")
        raise TypeError(f"jsonlsink cannot serialize {type(v).__name__}")

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(out, "w") as fh:
            for batch in iterator:  # pyarrow.RecordBatch per Arrow batch
                rows = batch.to_pylist()  # C-side columnar->dict conversion
                # sorted keys -> byte-deterministic content per row
                fh.writelines(
                    json.dumps(r, sort_keys=True, default=self._json_default)
                    + "\n"
                    for r in rows
                )
                n += len(rows)
        return _FileCommitMessage(out, n)

    def commit(self, messages) -> None:
        import json
        import os

        # a zero-task write (empty source DataFrame) never runs write(),
        # so the directory may not exist yet — the manifest must still
        # be committed for readers to see an (empty) atomic generation
        os.makedirs(self.path, exist_ok=True)
        manifest = {
            # sorted by path for a deterministic manifest
            "files": sorted(
                ({"path": m.path, "n_rows": m.n_rows} for m in messages if m),
                key=lambda d: d["path"],
            ),
            "total_rows": sum(m.n_rows for m in messages if m),
        }
        with open(os.path.join(self.path, "_manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=0, sort_keys=True)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def read_jsonl_sink(spark, path: str, schema: str):
    """Manifest-honoring read-back: only files the commit listed are
    visible (atomic visibility — orphan task output is ignored)."""
    import json
    import os

    with open(os.path.join(path, "_manifest.json")) as fh:
        manifest = json.load(fh)
    files = [f["path"] for f in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
