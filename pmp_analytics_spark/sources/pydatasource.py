"""Custom Python DataSource (Spark 4 Python Data Source API) — the
engine's connector extension point, exercised end-to-end: schema
discovery, partition planning, FILTER PUSHDOWN into the source, and
Arrow-batch emission, all from Python.

The concrete source here ("pyshard") reads a parquet file through
pyarrow — deliberately a format Spark already reads natively, so the
custom connector's results are fully oracle-checkable against the
native path. The shape is what a real exotic-source connector (REST
cursor, proprietary scan API, tape archive...) looks like:

- ``partitions()`` plans one InputPartition per parquet row group (row
  ranges when the file has a single group) — the unit of parallel read.
- ``pushFilters()`` accepts EqualTo filters on scan columns and applies
  them INSIDE the source (pyarrow predicate), returning unsupported
  filters to Spark — source-side pushdown, the S7 semantics of
  SURVEY.md §2.1 implemented through the public connector API.
- ``read()`` yields Arrow RecordBatches (zero row-at-a-time Python).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    InputPartition,
)

_SPARK_TYPES = {
    "int64": "bigint",
    "int32": "int",
    "string": "string",
    "large_string": "string",
    "double": "double",
    "float": "float",
    "bool": "boolean",
}


@dataclass
class _RowRange(InputPartition):
    row_group: int
    start: int
    end: int


class ParquetShardDataSource(DataSource):
    """spark.read.format("pyshard").option("path", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "pyshard"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        sch = pq.read_schema(self.options["path"])
        cols = ", ".join(
            f"`{f.name}` {_SPARK_TYPES.get(str(f.type), str(f.type))}" for f in sch
        )
        return cols

    def reader(self, schema) -> DataSourceReader:
        return _ShardReader(self.options)

    def streamReader(self, schema) -> "DataSourceStreamReader":
        return _ShardStreamReader(self.options)


class _ShardReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        # Big-enough splits that task-scheduling overhead amortizes; a
        # tiny default (e.g. 200) makes every real scan pure scheduler
        # churn. Tests override with a small value to force many splits.
        self.rows_per_split = int(options.get("rows_per_split", "4096"))
        self.filters: list[EqualTo] = []

    def pushFilters(self, filters):
        """Keep EqualTo filters for source-side evaluation; hand anything
        else back to Spark. (The source must still be CORRECT if Spark
        re-applies accepted filters — pushdown is an optimization, not a
        semantics change.)"""
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self.filters.append(f)
            else:
                unsupported.append(f)
        return iter(unsupported)

    def partitions(self):
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(self.path).metadata
        parts: list[_RowRange] = []
        for rg in range(meta.num_row_groups):
            n = meta.row_group(rg).num_rows
            for start in range(0, n, self.rows_per_split):
                parts.append(
                    _RowRange(rg, start, min(start + self.rows_per_split, n))
                )
        return parts

    def read(self, partition: _RowRange):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        table = pq.ParquetFile(self.path).read_row_group(partition.row_group)
        table = table.slice(partition.start, partition.end - partition.start)
        for f in self.filters:
            table = table.filter(pc.equal(table[f.attribute[0]], f.value))
        yield from table.to_batches()


class _ShardStreamReader(DataSourceStreamReader):
    """Offset-based micro-batch streaming over the same parquet shards:
    the offset is a ROW POSITION in the file; a micro-batch covers the
    [start, end) rows that appeared since the last committed offset,
    split into ``rows_per_split`` parallel partitions. Exactly-once
    comes from the offsets being deterministic row ranges — replaying a
    batch re-reads exactly the same rows — and a restart resumes from
    the checkpointed offset (a growing file streams only its new tail).
    ``latestOffset`` reports everything currently available (rate
    limiting under availableNow would stall the drain: the trigger
    stops at the first non-advancing batch).
    """

    def __init__(self, options):
        self.path = options["path"]
        self.rows_per_split = int(options.get("rows_per_split", "4096"))

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        # Re-read the footer EVERY poll (metadata-only, driver-side):
        # caching the row count at reader construction would freeze the
        # stream at the file's size when the query started — a growing
        # shard would never stream its new tail.
        import pyarrow.parquet as pq

        return {"row": pq.ParquetFile(self.path).metadata.num_rows}

    def partitions(self, start, end):
        return [
            _RowRange(0, s, min(s + self.rows_per_split, end["row"]))
            for s in range(start["row"], end["row"], self.rows_per_split)
        ]

    def read(self, partition: _RowRange):
        """Read ONLY the row groups covering [start, end) — never the
        whole file. A micro-batch split into P partitions must cost
        ~one file's worth of I/O total, not P full-file reads
        (O(file × partitions) is a scale-killer on a growing shard).
        Row offsets are file-global, so each task maps its range onto
        the group layout from the footer (metadata-only read) and
        slices relative to the first touched group's start row.
        """
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(self.path)
        meta = pf.metadata
        groups: list[int] = []
        first_group_start = 0
        pos = 0
        for rg in range(meta.num_row_groups):
            n = meta.row_group(rg).num_rows
            if pos < partition.end and pos + n > partition.start:
                if not groups:
                    first_group_start = pos
                groups.append(rg)
            pos += n
            if pos >= partition.end:
                break
        if not groups:
            return
        table = pf.read_row_groups(groups).slice(
            partition.start - first_group_start,
            partition.end - partition.start,
        )
        yield from table.to_batches()

    def commit(self, end):
        pass


def register(spark) -> None:
    # Python-source filter pushdown is opt-in (the worker refuses a
    # pushFilters() implementation without it).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ParquetShardDataSource)
