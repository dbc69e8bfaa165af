"""Streaming XML source/sink built on the Spark 4 Python DataSource
streaming API.

Reader: a file-tailing source (the shape of Spark's own FileStreamSource).
Offsets are the set of files already delivered, as a
``{"files": {path: size}}`` dict; each microbatch plans byte-range splits
for newly appeared files only, so the per-batch work distributes exactly
like the batch scan (same tokenizer, same ownership rule). This is the
full ``DataSourceStreamReader`` (executor-side reads) — not the
driver-side Simple variant — so batch size is bounded by split planning,
not driver throughput.

Writer: one complete XML document per partition per microbatch, named
with the batch id; ``abort`` removes that batch's files (best-effort
rollback, matching the batch writer's semantics).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)

from spark_xml_spark.options import XmlOptions
from spark_xml_spark.xmlcore import parser, tokenizer


@dataclass
class XmlStreamPartition(InputPartition):
    path: str
    start: int
    end: int
    compression: str
    whole_file: bool


class XmlStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: T.StructType):
        self._opts_dict = dict(options)
        self._schema = schema
        self._path = options.get("path") or options.get("location")
        if not self._path:
            raise ValueError("path option is required for the xml stream source")
        self._target = int(
            options.get("targetSplitSize")
            or options.get("targetsplitsize")
            or 128 * 1024 * 1024
        )

    # -- offsets -----------------------------------------------------------
    def _snapshot(self) -> dict:
        files = {}
        root = self._path
        if os.path.isdir(root):
            for name in sorted(os.listdir(root)):
                p = os.path.join(root, name)
                if os.path.isfile(p) and not name.startswith(("_", ".")):
                    files[p] = os.path.getsize(p)
        elif os.path.isfile(root):
            files[root] = os.path.getsize(root)
        return {"files": files}

    def initialOffset(self) -> dict:
        return {"files": {}}

    def latestOffset(self) -> dict:
        return self._snapshot()

    def partitions(self, start: dict, end: dict) -> List[InputPartition]:
        seen = set((start or {}).get("files", {}))
        new_files = [p for p in (end or {}).get("files", {}) if p not in seen]
        parts: List[XmlStreamPartition] = []
        xopts = XmlOptions.from_dict(self._opts_dict)
        for f in new_files:
            for s in tokenizer.plan_splits(f, xopts.charset, self._target):
                parts.append(
                    XmlStreamPartition(
                        s.path, s.start, s.end, s.compression or "", s.whole_file
                    )
                )
        # Spark requires at least one partition per batch; an empty batch
        # gets an empty marker partition.
        if not parts:
            parts = [XmlStreamPartition("", 0, 0, "", False)]
        return parts

    def read(self, partition: XmlStreamPartition) -> Iterator[tuple]:
        if not partition.path:
            return iter(())
        xopts = XmlOptions.from_dict(self._opts_dict)
        split = tokenizer.FileSplit(
            partition.path,
            partition.start,
            partition.end,
            partition.compression or None,
            partition.whole_file,
        )
        records = tokenizer.scan_split(split, xopts.row_tag, xopts.charset)
        return parser.parse_records(records, self._schema, xopts)

    def commit(self, end: dict) -> None:
        pass


@dataclass
class XmlStreamCommitMessage(WriterCommitMessage):
    file: str


class XmlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict, schema: T.StructType):
        self._opts_dict = dict(options)
        self._schema = schema
        self._path = options.get("path") or options.get("location")
        if not self._path:
            raise ValueError("path option is required for the xml stream sink")

    def write(self, iterator) -> XmlStreamCommitMessage:
        import uuid

        from pyspark import TaskContext

        from spark_xml_spark.xmlcore import generator

        xopts = XmlOptions.from_dict(self._opts_dict)
        os.makedirs(self._path, exist_ok=True)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        name = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.xml"
        target = os.path.join(self._path, name)
        wrote = False
        with open(target, "w", encoding=xopts.charset) as fh:
            for line in generator.rows_to_document(self._schema, iterator, xopts):
                fh.write(line)
                fh.write("\n")
                wrote = True
        if not wrote:
            os.remove(target)
            name = ""
        return XmlStreamCommitMessage(file=name)

    def commit(self, messages, batchId: int) -> None:
        pass

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.file:
                try:
                    os.remove(os.path.join(self._path, m.file))
                except OSError:
                    pass
