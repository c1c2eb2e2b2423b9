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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


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
        yield from pa.table(columns, schema=target).to_batches()


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


def register(spark) -> None:
    """Idempotent registration of all Python data sources in this module."""
    spark.dataSource.register(JsonLinesDataSource)
