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
    # One task reads these splits sequentially; each tuple is
    # (path, start, end, compression, whole_file, snap_size) with
    # snap_size the file size recorded in the committed offset. Small
    # files are bin-packed like the batch reader's FilePartition
    # semantics: a micro-batch that discovers thousands of small files
    # must not schedule thousands of tasks. An empty tuple marks an
    # empty batch (Spark requires >= 1 partition).
    splits: tuple


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
        from spark_xml_spark.sources import partitions as pmod

        try:
            # partition-aware listing: a Hive-style layout's nested files
            # are discovered recursively; flat dirs list exactly as before
            listed = [(f, sz) for f, sz, _ in pmod.discover_partitions(self._path)[0]]
        except FileNotFoundError:
            listed = []
        return {"files": {p: size for p, size in listed}}

    def initialOffset(self) -> dict:
        return {"files": {}}

    def latestOffset(self) -> dict:
        return self._snapshot()

    def partitions(self, start: dict, end: dict) -> List[InputPartition]:
        from spark_xml_spark.xmlcore import fs

        seen = set((start or {}).get("files", {}))
        end_files = (end or {}).get("files", {})
        new_files = [p for p in end_files if p not in seen]
        raw: List[tuple] = []
        xopts = XmlOptions.from_dict(self._opts_dict)
        for f in new_files:
            # Deterministic replay: the offset recorded the file's size at
            # snapshot time. Plan/clamp splits against THAT size, never the
            # current one — a file that grew since yields identical rows; a
            # file that shrank (rewritten) is skipped entirely rather than
            # replayed with different content (ADVICE r2).
            snap = int(end_files[f])
            try:
                cur = fs.size_of(f)
            except (OSError, FileNotFoundError):
                continue
            if cur < snap:
                continue
            for s in tokenizer.plan_splits(f, xopts.charset, self._target):
                if s.whole_file:
                    if cur != snap:
                        # compressed/whole-file content changed; not replayable
                        continue
                    raw.append((s.path, s.start, s.end, s.compression or "", True, snap))
                else:
                    if s.start >= snap:
                        continue
                    raw.append(
                        (s.path, s.start, min(s.end, snap), s.compression or "", False, snap)
                    )
        # bin-pack small splits so a many-small-files batch stays O(cores)
        # tasks (same maxSplitBytes/open-cost shape as the batch reader)
        open_cost = int(
            self._opts_dict.get("openCostBytes")
            or self._opts_dict.get("opencostbytes")
            or 4 * 1024 * 1024
        )

        def _size(t):
            if t[2] >= 0:
                return t[2] - t[1]
            return t[5] if t[5] >= 0 else self._target

        total = sum(_size(t) + open_cost for t in raw)
        par = int(
            self._opts_dict.get("minPartitions")
            or self._opts_dict.get("minpartitions")
            or (os.cpu_count() or 8)
        )
        pack_target = min(self._target, max(open_cost, total // max(par, 1)))
        raw.sort(key=lambda t: (-_size(t), t[0], t[1]))
        parts: List[XmlStreamPartition] = []
        cur_group: List[tuple] = []
        cur_cost = 0
        for t in raw:
            sz = _size(t)
            if cur_group and cur_cost + sz > pack_target:
                parts.append(XmlStreamPartition(tuple(cur_group)))
                cur_group, cur_cost = [], 0
            cur_group.append(t)
            cur_cost += sz + open_cost
        if cur_group:
            parts.append(XmlStreamPartition(tuple(cur_group)))
        # Spark requires at least one partition per batch; an empty batch
        # gets an empty marker partition.
        if not parts:
            parts = [XmlStreamPartition(())]
        return parts

    def _attach_fields(self, filepath: str):
        """Schema-tail fields matching this file's path-derived partition
        keys -> [(index-in-schema, name, typed value)], [] when the
        layout (or the declared schema) is unpartitioned. Pure path
        logic; values convert per the DECLARED schema type (streams
        always run with an explicit schema)."""
        from spark_xml_spark.sources import partitions as pmod

        kv = pmod.partition_values_of(self._path, filepath)
        if not kv:
            return []
        names = [f.name for f in self._schema.fields]
        keys = [k for k, _ in kv]
        if names[-len(keys):] != keys:
            return []  # schema does not expose the partition columns
        out = []
        for (k, v), f in zip(kv, self._schema.fields[-len(keys):]):
            if v is None:
                out.append((k, None))
            elif isinstance(f.dataType, (T.LongType, T.IntegerType)):
                out.append((k, int(v)))
            elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                out.append((k, float(v)))
            else:
                out.append((k, v))
        return out

    def read(self, partition: XmlStreamPartition) -> Iterator[tuple]:
        xopts = XmlOptions.from_dict(self._opts_dict)

        def _rows():
            for path, start, end, compression, whole_file, snap in partition.splits:
                split = tokenizer.FileSplit(
                    path, start, end, compression or None, whole_file, eof=snap
                )
                attach = self._attach_fields(path)
                if attach:
                    dschema = T.StructType(
                        self._schema.fields[: -len(attach)]
                    )
                    pv = tuple(v for _, v in attach)
                else:
                    dschema, pv = self._schema, ()
                records = tokenizer.scan_split(split, xopts.row_tag, xopts.charset)
                for row in parser.parse_records(records, dschema, xopts):
                    yield tuple(row) + pv

        return _rows()

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

        import io

        from spark_xml_spark.xmlcore import fs

        xopts = XmlOptions.from_dict(self._opts_dict)
        fs.makedirs(self._path)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        name = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.xml"
        target = self._path.rstrip("/") + "/" + name
        wrote = False
        with io.TextIOWrapper(fs.open_output(target), encoding=xopts.charset) as fh:
            for line in generator.rows_to_document(self._schema, iterator, xopts):
                fh.write(line)
                fh.write("\n")
                wrote = True
        if not wrote:
            fs.delete_file(target)
            name = ""
        return XmlStreamCommitMessage(file=name)

    def commit(self, messages, batchId: int) -> None:
        pass

    def abort(self, messages, batchId: int) -> None:
        from spark_xml_spark.xmlcore import fs

        for m in messages:
            if m is not None and m.file:
                try:
                    fs.delete_file(self._path.rstrip("/") + "/" + m.file)
                except OSError:
                    pass
