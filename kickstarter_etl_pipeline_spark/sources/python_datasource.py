"""Custom connector via the Python Data Source API (Spark 4).

The reference's only source is a pandas CSV read (``src/etl_pipeline.py:53``);
its Spark translation (sources/readers.py) covers the built-in formats.
This module covers the OTHER half of a source layer: ingesting a format
or service Spark has no JVM connector for, without writing Scala. The
Python Data Source API (SPARK-44076, GA in Spark 4) is the sanctioned
extension point: the driver plans :class:`InputPartition` units, and
each executor's Python worker reads only its partition — the source
scales out like any file scan instead of funnelling through the driver.

Design notes for the 100 TB posture:

- **One partition per file** (``JsonLinesReader.partitions``): the unit
  of parallelism and of retry. A directory of N files fans out to N
  tasks; a failed task re-reads one file, not the dataset.
- **Arrow batches, not Python rows**: ``read`` yields
  ``pyarrow.RecordBatch`` — the vectorized transfer path of the API.
  Parsing runs in pyarrow's C++ JSON reader; Python never touches
  individual rows, so the per-row interpreter tax of a naive custom
  source is avoided entirely.
- **Declared schema is the contract**: batches are column-pruned,
  reordered, and cast to the DDL schema the session asked for, so the
  JVM side sees exactly the types it planned for (pyarrow's inference
  widening — e.g. everything-null → null type — cannot leak through).

Spark's built-in ``spark.read.json`` remains the right tool for plain
JSONL on a Hadoop-visible filesystem; this class exists as the pattern
for sources that have no such reader (internal services, bespoke
framings) and is exercised end-to-end by the ``jsonl_pyds_roundtrip_agg``
query against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


#: Spark simple-DDL type → pyarrow type factory (the subset the fixture
#: tables need; extend as formats demand).
_ARROW_TYPES = {
    "bigint": "int64",
    "long": "int64",
    "int": "int32",
    "integer": "int32",
    "double": "float64",
    "string": "string",
    "boolean": "bool_",
}


class JsonLinesReader(DataSourceReader):
    def __init__(self, options: dict, fields: list[tuple[str, str]]):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyjsonl requires a path (…load(path))")
        #: [(name, spark simple type string), …] — plain data so the
        #: reader pickles cleanly to executors.
        self.fields = fields
        #: [(column, op, value), …] accepted by pushFilters; applied
        #: inside read() so filtered rows never cross the Arrow channel.
        self.pushed: list[tuple[str, str, object]] = []

    def pushFilters(self, filters):
        """Accept the comparison filters we can evaluate source-side
        (conjunctive list per the API contract). Rows failing a pushed
        filter are dropped inside the connector — before Arrow
        serialization and the Python→JVM hop — which at 100 TB is the
        difference between shipping a table and shipping a slice. Spark
        keeps the filter in the plan for correctness (a source may
        under-filter), so acceptance only has to be sound, not exact.
        Unsupported shapes (OR trees never arrive; IsNull, string ops,
        nested paths are declined here) are yielded back for Spark to
        evaluate post-scan."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            IsNotNull,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "==",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
            IsNotNull: "notnull",
        }
        declared = {n for n, _ in self.fields}
        for f in filters:
            op = ops.get(type(f))
            if op is not None and len(f.attribute) == 1 and f.attribute[0] in declared:
                self.pushed.append(
                    (f.attribute[0], op, getattr(f, "value", None))
                )
            else:
                yield f

    def _target_schema(self):
        import pyarrow as pa

        out = []
        for name, typ in self.fields:
            factory = _ARROW_TYPES.get(typ.lower())
            if factory is None:
                raise ValueError(f"pyjsonl: unsupported field type {typ!r} for {name!r}")
            out.append(pa.field(name, getattr(pa, factory)()))
        return pa.schema(out)

    def partitions(self):
        import glob
        import os

        if os.path.isdir(self.path):
            files = sorted(
                f
                for f in glob.glob(os.path.join(self.path, "*"))
                if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
            )
        else:
            files = [self.path]
        if not files:
            raise ValueError(f"pyjsonl: no input files under {self.path}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        import pyarrow.json as pj

        target = self._target_schema()
        table = pj.read_json(partition.path)
        # Prune + reorder to the declared schema; missing columns become
        # all-NULL (schema evolution contract for JSONL: absent key = NULL).
        import pyarrow as pa

        columns = []
        for field in target:
            if field.name in table.column_names:
                columns.append(table.column(field.name).cast(field.type))
            else:
                columns.append(pa.nulls(len(table), field.type))
        out = pa.table(columns, schema=target)
        if self.pushed:
            import pyarrow.compute as pc

            mask = None
            for name, op, value in self.pushed:
                col = out.column(name)
                if op == "notnull":
                    cond = pc.is_valid(col)
                else:
                    cond = {
                        "==": pc.equal,
                        ">": pc.greater,
                        ">=": pc.greater_equal,
                        "<": pc.less,
                        "<=": pc.less_equal,
                    }[op](col, pa.scalar(value))
                    # Comparisons propagate NULL; a filter must DROP
                    # null rows like SQL does.
                    cond = pc.and_kleene(cond, pc.is_valid(col))
                mask = cond if mask is None else pc.and_(mask, cond)
            out = out.filter(mask)
        yield from out.to_batches()


class _Committed(WriterCommitMessage):
    def __init__(self, final_path: str, tmp_path: str):
        self.final_path = final_path
        self.tmp_path = tmp_path


class JsonLinesWriter(DataSourceWriter):
    """Write side of the connector, with the two-phase commit protocol
    every distributed sink needs: each task writes to a hidden temp
    file and reports it in its :class:`WriterCommitMessage`; only the
    driver's ``commit`` renames temps to visible names and drops the
    ``_SUCCESS`` marker. A reader that filters uncommitted files (ours
    skips ``_``/``.`` prefixes) therefore never observes output of a
    failed or speculative task — the same contract as Hadoop
    FileOutputCommitter v1, expressed in ~40 lines of Python."""

    def __init__(self, options: dict, schema_fields: list[str]):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyjsonl requires a path (…save(path))")
        self.columns = schema_fields

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.json"
        tmp = os.path.join(self.path, f"._tmp_{name}")
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.columns, row)), ensure_ascii=False))
                f.write("\n")
        return _Committed(os.path.join(self.path, name), tmp)

    def commit(self, messages):
        import os

        for m in messages:
            os.rename(m.tmp_path, m.final_path)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class JsonLinesDataSource(DataSource):
    """``spark.read.format("pyjsonl").schema(ddl).load(dir)`` — JSONL via
    the Python Data Source API with per-file partitions and Arrow-batch
    transfer. Register once per session:
    ``spark.dataSource.register(JsonLinesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def schema(self) -> str:
        # Used only when the caller did not pass .schema(...): default to
        # the documents fixture layout.
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> JsonLinesReader:
        # Spark hands reader() a StructType (built from .schema(...) or
        # from self.schema()); flatten to plain (name, type) pairs.
        fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        return JsonLinesReader(self.options, fields)

    def writer(self, schema, overwrite: bool) -> JsonLinesWriter:
        if overwrite:
            # Clear previously-committed output; temps of a concurrent
            # failed write are already invisible to the reader.
            import glob
            import os

            path = self.options.get("path", "")
            for f in glob.glob(os.path.join(path, "*")) + glob.glob(
                os.path.join(path, "_SUCCESS")
            ):
                if os.path.isfile(f):
                    os.remove(f)
        return JsonLinesWriter(self.options, [f.name for f in schema.fields])


class _RangePartition(InputPartition):
    def __init__(self, path: str, lo: int, hi: int):
        self.path = path
        self.lo = lo
        self.hi = hi


class EventLogStreamReader(DataSourceStreamReader):
    """Offset-tracked replay of a parquet event log in ``n_batches``
    micro-batches — the streaming half of the connector API.

    Offset model: a single monotonically-increasing batch counter
    (``{"batch": k}`` = rows [0, k·rows_per_batch) consumed). The
    driver-side reader owns offset arithmetic only; ``partitions``
    maps an offset RANGE to row-range InputPartitions and executors
    read their slice — the same planner/worker split as the batch
    reader, which is what makes the source scale out. A production
    source would map offsets to file sets or log positions instead of
    row numbers; the protocol (initialOffset / latestOffset /
    partitions / read / commit) is identical.

    ``latestOffset`` advances one batch per micro-batch, giving the
    engine a bounded-admission stream (the maxOffsetsPerTrigger
    pattern) rather than one giant batch.
    """

    def __init__(self, options: dict, fields: list[tuple[str, str]]):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyeventlog requires a path option")
        self.fields = fields
        self.n_batches = int(options.get("batches", "5"))
        import pyarrow.parquet as pq

        self.n_rows = pq.ParquetFile(self.path).metadata.num_rows
        self.rows_per_batch = max(1, -(-self.n_rows // self.n_batches))
        self._emitted = 0

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def latestOffset(self) -> dict:
        if self._emitted < self.n_batches:
            self._emitted += 1
        return {"batch": self._emitted}

    def partitions(self, start: dict, end: dict):
        out = []
        for b in range(start["batch"], end["batch"]):
            lo = b * self.rows_per_batch
            hi = min((b + 1) * self.rows_per_batch, self.n_rows)
            if lo < hi:
                out.append(_RangePartition(self.path, lo, hi))
        return out

    def read(self, partition: _RangePartition):
        import pyarrow.parquet as pq

        names = [n for n, _ in self.fields]
        table = pq.read_table(partition.path, columns=names).select(names)
        yield from table.slice(partition.lo, partition.hi - partition.lo).to_batches()

    def commit(self, end: dict) -> None:
        # Nothing to clean up: the log is immutable. A consuming source
        # (queue, CDC feed) would acknowledge/trim up to `end` here.
        pass


class EventLogStreamDataSource(DataSource):
    """``spark.readStream.format("pyeventlog").schema(ddl)
    .option("batches", n).load(path)`` — replayable micro-batch stream
    over a parquet event log via the Python Data Source streaming API."""

    @classmethod
    def name(cls) -> str:
        return "pyeventlog"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def streamReader(self, schema) -> EventLogStreamReader:
        fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        return EventLogStreamReader(self.options, fields)


def register(spark) -> None:
    """Idempotent registration of all Python data sources in this module."""
    from kickstarter_etl_pipeline_spark.session import ensure_runtime_confs

    # pushFilters hard-errors unless spark.sql.python.filterPushdown.enabled.
    ensure_runtime_confs(spark)
    spark.dataSource.register(JsonLinesDataSource)
    spark.dataSource.register(EventLogStreamDataSource)
