"""Custom Python DataSource (Spark 4 DataSource API): `flowlog` format.

``spark.read.format("flowlog").load(path)`` scans raw VPC Flow Log text files
and emits typed rows directly — parsing pushed into the source, one partition
per file, schema declared up front. This is the packaged-connector form of
what parse.parse_lines does as a transformation: a user points the reader at
a log dump and gets FLOW_SCHEMA rows (+ raw/error for dead-lettering) with no
pipeline assembly.

Python data sources run in the Python worker (slower than the JVM text
reader + Column parse used by the main pipeline) — this exists for
connector-surface completeness and for formats the JVM has no reader for.
"""

from __future__ import annotations

import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

from ..schema import FLOW_FIELDS, FLOW_LINE_PATTERN

READ_SCHEMA = T.StructType(
    [T.StructField("raw", T.StringType(), True),
     T.StructField("error", T.BooleanType(), True)]
    + [T.StructField(n, t, True) for n, t in FLOW_FIELDS]
)

_LONG_FIELDS = {n for n, t in FLOW_FIELDS if t.typeName() == "long"}


class FlowLogDataSource(DataSource):
    """format name: ``flowlog``; option ``path`` = file or glob of text logs."""

    @classmethod
    def name(cls) -> str:
        return "flowlog"

    def schema(self):
        return READ_SCHEMA

    def reader(self, schema):
        return FlowLogReader(self.options)

    def simpleStreamReader(self, schema):
        return FlowLogStreamReader(self.options)


class FlowLogReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flowlog source requires a path")

    def partitions(self):
        import glob as globmod
        import os

        # Only real files become partitions. The old `or [self.path]`
        # fallback made a zero-match glob (or a directory path) crash at
        # READ time with FileNotFoundError/IsADirectoryError while the
        # streaming reader treats the same input as empty — batch and
        # stream must agree (code-review r6). A literal path that simply
        # does not exist still fails, but at PLAN time with a clear
        # message.
        matches = sorted(globmod.glob(self.path))
        files = [f for f in matches if os.path.isfile(f)]
        if not files and not globmod.has_magic(self.path):
            if not os.path.exists(self.path):
                raise FileNotFoundError(
                    f"flowlog source path does not exist: {self.path}"
                )
        return [InputPartition(f) for f in files]

    def read(self, partition):
        if partition is None:  # empty partitions() -> one read(None) call
            return
        pattern = re.compile(FLOW_LINE_PATTERN)
        with open(partition.value) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line:
                    yield _parse_line(line, pattern)


_INT64_MIN, _INT64_MAX = -(1 << 63), (1 << 63) - 1


def _parse_line(line: str, pattern) -> tuple:
    """One text line -> a READ_SCHEMA tuple (shared by batch + stream).

    A regex-valid token that overflows int64 (the pattern's ``\\d+`` is
    unbounded) degrades that FIELD to None — a Python int the LongType row
    conversion cannot store would fail the task and defeat the source's
    dead-letter design (code-review r6). Field-level NULL, not error=True,
    to mirror parse.py's try_cast semantics exactly: the reference's
    Number() floats the value and the record flows through."""
    m = pattern.match(line)
    if not m:
        return (line, True) + (None,) * len(FLOW_FIELDS)
    vals = []
    for (name, _), tok in zip(FLOW_FIELDS, m.groups()):
        if name in _LONG_FIELDS:
            v = int(tok)
            vals.append(v if _INT64_MIN <= v <= _INT64_MAX else None)
        else:
            vals.append(tok)
    return (line, False) + tuple(vals)


class FlowLogStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the connector: `spark.readStream.format("flowlog")`.

    File-tailing source with exactly-once file accounting: the offset is the
    sorted list of file paths already delivered (JSON-serializable, stored
    in the checkpoint's offset log). ``read`` delivers every file that
    appeared since the last offset; ``readBetweenOffsets`` replays a
    committed range deterministically after restart — the two halves of the
    Simple stream-reader contract. Driver-side file listing + worker-side
    parse mirrors how Spark's own file source splits the work.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flowlog stream source requires a path")

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _list(self) -> list[str]:
        import glob as globmod
        import os

        # same real-files-only rule as the batch reader's partitions()
        return sorted(f for f in globmod.glob(self.path) if os.path.isfile(f))

    def _rows_for(self, files: list[str]) -> list[tuple]:
        # materialized, not a generator: Spark's prefetch cache copies the
        # returned iterator for replay, and generators aren't picklable
        pattern = re.compile(FLOW_LINE_PATTERN)
        rows = []
        for f in files:
            with open(f) as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if line:
                        rows.append(_parse_line(line, pattern))
        return rows

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        new = [f for f in self._list() if f not in seen]
        end = {"seen": sorted(seen | set(new))}
        return iter(self._rows_for(new)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        replay = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        return iter(self._rows_for(replay))


def register(spark) -> None:
    """Idempotent registration: after this, format('flowlog') resolves."""
    spark.dataSource.register(FlowLogDataSource)
