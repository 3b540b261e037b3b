"""Custom data source via the PySpark 4 Python Data Source API.

Maps the reference's DataSource V2 surface (reference: sql/core/src/main/
java/org/apache/spark/sql/sources/v2/ ReadSupport interfaces + execution/
datasources/v2/DataSourceV2Strategy.scala) to its modern PySpark
equivalent: a declarative source with explicit input PARTITIONS, so reads
parallelise across executors exactly like a file scan.

``ushas_synthetic`` generates deterministic rows from a splitmix-style
integer mix -- same numbers on every engine/run, so the DuckDB oracle can
reproduce them arithmetically (the correctness gate then covers the
custom-source read path end to end).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

MIX_MULT = 2654435761  # Knuth multiplicative hash constant
MIX_MOD = 2147483647


class SyntheticPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        # Returning an EMPTY partition list makes Spark invoke read(None)
        # -- always emit at least one (possibly empty) partition.
        if self.n_rows <= 0:
            return [SyntheticPartition(0, 0)]
        step = max(1, self.n_rows // self.n_parts)
        parts = []
        for start in range(0, self.n_rows, step):
            parts.append(SyntheticPartition(start, min(start + step, self.n_rows)))
        return parts

    def read(self, partition: SyntheticPartition):
        for i in range(partition.start, partition.end):
            mixed = (i * MIX_MULT) % MIX_MOD
            yield (i, mixed % 10, float(mixed % 100000) / 100.0)


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same deterministic row space: batch
    k serves rows [k*batchRows, ...) until ``rows`` is exhausted --
    offsets are plain dicts, so checkpoint/restart replays identically
    (the Python mirror of the reference's V2 MicroBatchReadSupport,
    sql/sources/v2/reader/streaming/MicroBatchReader.java)."""

    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 100))
        self.batch = int(options.get("batchRows", 37))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i = int(start["i"])
        end = min(i + self.batch, self.n_rows)
        return (self._rows(i, end), {"i": end})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["i"]), int(end["i"]))

    @staticmethod
    def _rows(start: int, end: int):
        # A LIST ITERATOR, not a generator: the simple-reader prefetch
        # cache copy.copy()s the iterator for replay -- list iterators
        # support that via __reduce__, generators don't.
        return iter([
            (i, (i * MIX_MULT) % MIX_MOD % 10,
             float((i * MIX_MULT) % MIX_MOD % 100000) / 100.0)
            for i in range(start, end)
        ])


class SyntheticDataSource(DataSource):
    """format('ushas_synthetic') -- options: rows, partitions; also a
    streaming source (micro-batches of batchRows)."""

    @classmethod
    def name(cls) -> str:
        return "ushas_synthetic"

    def schema(self) -> str:
        return "id bigint, bucket int, val double"

    def reader(self, schema) -> SyntheticReader:
        return SyntheticReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticStreamReader:
        return SyntheticStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDataSource)


# ------------------------------------------------------- write support
class _CollectingWriter(DataSourceWriter):
    """DataSourceWriter: each executor task writes its partition's rows
    to a per-task spill file under the (driver-provided) sink directory
    and reports (n_rows, checksum) back through its commit message --
    the WriteSupport/WriterCommitMessage protocol of the reference's
    DSv2 (sql/core/src/main/java/org/apache/spark/sql/sources/v2/
    writer/DataSourceWriter.java) in its PySpark form."""

    def __init__(self, options: dict):
        self.path = options.get("path")

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext
        from pyspark.sql.datasource import WriterCommitMessage

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        n = 0
        checksum = 0
        rows = []
        for row in iterator:
            n += 1
            checksum = (checksum + int(row[0]) * 31 + int(row[1])) % MIX_MOD
            rows.append([int(row[0]), int(row[1])])
        fname = os.path.join(self.path, f"part-{pid}-{uuid.uuid4().hex}.json")
        with open(fname, "w", encoding="utf-8") as fh:
            json.dump(rows, fh)

        class Msg(WriterCommitMessage):
            pass

        m = Msg()
        m.n_rows = n
        m.checksum = checksum
        m.file = fname
        return m

    def commit(self, messages):
        import json
        import os

        total = sum(m.n_rows for m in messages)
        with open(
            os.path.join(self.path, "_SUCCESS.json"), "w", encoding="utf-8"
        ) as fh:
            json.dump(
                {
                    "n_rows": total,
                    "n_tasks": len(messages),
                    "checksums": sorted(m.checksum for m in messages),
                },
                fh,
            )

    def abort(self, messages):
        import os

        for m in messages:
            if getattr(m, "file", None) and os.path.exists(m.file):
                os.remove(m.file)


class SyntheticSinkDataSource(DataSource):
    """Write-side companion source (`ushas_sink`): append-mode batch
    writes fan out per partition, commit on the driver aggregates the
    task messages -- the full DSv2 write protocol in Python."""

    @classmethod
    def name(cls) -> str:
        return "ushas_sink"

    def schema(self) -> str:
        return "k bigint, v bigint"

    def writer(self, schema, overwrite: bool):
        return _CollectingWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(SyntheticSinkDataSource)
