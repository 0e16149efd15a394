"""Streaming Python DataSource (Spark 4 ``DataSourceStreamReader``).

batch half of this extension surface lives in pydatasource.py
(``format("mrtext")``); this module adds the STREAMING half — the full
``DataSourceStreamReader`` contract (not the driver-side
``SimpleDataSourceStreamReader``): the driver plans offset ranges and
partitions, and the rows are read EXECUTOR-side in the Python worker,
Arrow-batched to the JVM. This is the template for any custom streaming
connector Spark lacks a built-in for (an internal changelog, a paginated
HTTP feed, a proprietary queue): offsets are a JSON dict, a micro-batch
is the half-open range between two offsets, and recovery re-reads a
range deterministically from the checkpointed offsets.

The concrete source streams a parquet file as row-index ranges:

    spark.dataSource.register(DocRangeStreamDataSource)
    df = (spark.readStream.format("docrange")
          .option("path", ".../documents.parquet").load())

- ``initialOffset`` = row 0; ``latestOffset`` = the file's footer row
  count (one metadata read, no data scan). With ``rowsPerBatch`` set,
  ``latestOffset`` advances at most that many rows per call — Spark's
  rate-limit hook (the analog of maxFilesPerTrigger) — so a drain
  becomes MULTIPLE micro-batches exercising the cross-batch offset
  walk; leave it unset for a single-batch availableNow drain (the
  rate-limited form is for fresh-checkpoint tests: a restarted query
  resumes from the checkpoint, not from this reader's counter).
- ``partitions(start, end)`` chunks the range into ``partitionRows``
  slices → parallelism within a micro-batch is (range / partitionRows),
  independent of file count (vs the reference's one-task-per-file
  granularity, rpc.go:219-228).
- ``read(partition)`` is row-group aware: it reads ONLY the parquet row
  groups overlapping its slice (footer statistics, no full-file read),
  then trims — at 100 TB a partition touches its ~128 MB of row groups
  and nothing else. Only ``STREAM_COLUMNS`` are materialized (column
  pruning at the source, the reader's half of ReadSchema).
- ``commit(end)`` is a no-op: a parquet file needs no acknowledgement;
  a queue-backed source would ack/trim its log here.

Determinism: parquet row order is stable, so range [a, c) equals
[a, b) ∪ [b, c) for any split — the recovery invariant
``tests/properties/test_round12_properties.py`` pins directly.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

STREAM_COLUMNS = ("doc_id", "source", "lang", "n_chars")
STREAM_SCHEMA = "doc_id bigint, source string, lang string, n_chars bigint"


class _RowRange(InputPartition):
    def __init__(self, path: str, begin: int, end: int):
        self.path = path
        self.begin = begin
        self.end = end


def _read_row_range(path: str, begin: int, end: int):
    """Read rows [begin, end) of a parquet file, touching only the row
    groups that overlap the range (runs executor-side)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    groups, first_row = [], 0
    row = 0
    for g in range(pf.metadata.num_row_groups):
        n = pf.metadata.row_group(g).num_rows
        if row + n > begin and row < end:
            if not groups:
                first_row = row
            groups.append(g)
        row += n
        if row >= end:
            break
    if not groups:
        return
    tbl = pf.read_row_groups(groups, columns=list(STREAM_COLUMNS))
    tbl = tbl.slice(begin - first_row, end - begin)
    for batch in tbl.to_batches():
        yield from zip(*(batch.column(c).to_pylist() for c in STREAM_COLUMNS))


class _DocRangeStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("docrange requires a path (.parquet file)")
        self.rows_per_batch = int(options.get("rowsPerBatch", 0))
        self.partition_rows = max(1, int(options.get("partitionRows", 2000)))
        self._pos = 0  # rate-limit counter (fresh-checkpoint runs only)
        self._total = None

    def _num_rows(self) -> int:
        if self._total is None:
            import pyarrow.parquet as pq

            self._total = pq.ParquetFile(self.path).metadata.num_rows
        return self._total

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        total = self._num_rows()
        if self.rows_per_batch <= 0:
            return {"row": total}
        self._pos = min(self._pos + self.rows_per_batch, total)
        return {"row": self._pos}

    def partitions(self, start: dict, end: dict):
        b, e = int(start["row"]), int(end["row"])
        return [
            _RowRange(self.path, lo, min(lo + self.partition_rows, e))
            for lo in range(b, e, self.partition_rows)
        ] or [_RowRange(self.path, b, e)]

    def read(self, partition: _RowRange):
        yield from _read_row_range(partition.path, partition.begin, partition.end)

    def commit(self, end: dict) -> None:
        # Nothing to release for a file; a log-backed source acks here.
        return None


class DocRangeStreamDataSource(DataSource):
    """``format("docrange")``: stream a parquet file as row-index ranges."""

    @classmethod
    def name(cls) -> str:
        return "docrange"

    def schema(self) -> str:
        return STREAM_SCHEMA

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _DocRangeStreamReader(self.options)


def register_docrange(spark) -> None:
    """Idempotently register the docrange streaming format on a session."""
    spark.dataSource.register(DocRangeStreamDataSource)
