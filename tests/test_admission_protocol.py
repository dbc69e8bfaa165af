"""Engine-protocol simulation for the streaming source's admission control
(streaming/source.py): drive XmlStreamReader through the MicroBatchExecution
call sequence observed empirically (latestOffset BEFORE initialOffset on a
fresh query; neither on a committed restart; partitions(start, end) replayed
for an uncommitted WAL entry) — including crash points — and assert the two
invariants that matter:

  EXACTLY-ONCE  every file lands in exactly one PLANNED BATCH (Spark's
                guarantee is replay + an idempotent-by-batchId sink, so
                the sim keys deliveries by WAL index: a replayed batch
                overwrites its slot and must reproduce the same file set)
  CAP           with admissionCursorPath, every planned batch admits at
                most maxFilesPerTrigger new files (without it, only the
                first batch of a run may exceed the cap — the documented
                fallback)

No SparkSession needed: the reader's driver-side methods are plain Python.
"""

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from spark_xml_spark.streaming.source import XmlStreamReader

SCHEMA = T.StructType([T.StructField("a", T.LongType())])


class EngineSim:
    """Minimal MicroBatchExecution: offset WAL + commit log + crash/restart.

    A batch is planned when latestOffset differs from the current end
    position; planning writes the WAL entry FIRST (as the engine does),
    then calls partitions(start, end); commit follows. A crash can land
    between WAL write and partitions, or between partitions and commit —
    on restart the uncommitted WAL entry is replayed through
    partitions(start, end) before any new latestOffset, exactly like
    MicroBatchExecution's populateStartOffsets."""

    def __init__(self, src_dir, cap, cursor):
        self.src = str(src_dir)
        self.opts = {"path": self.src, "rowTag": "r",
                     "maxFilesPerTrigger": str(cap)}
        if cursor:
            self.opts["admissionCursorPath"] = os.path.join(
                self.src, "..", "cursor.json"
            )
        self.cap = cap
        self.wal = []      # planned (start, end) pairs, in order
        self.commits = 0   # how many WAL entries are committed
        self.batch_files = {}  # wal index -> file paths (idempotent sink)
        self.batch_new_counts = []  # new files per planned batch per run
        self.fresh = True
        self._new_reader()

    def _new_reader(self):
        self.reader = XmlStreamReader(dict(self.opts), SCHEMA)
        self.run_batches = 0  # planned batches in THIS run

    def _deliver(self, wal_idx, parts):
        got = [split[0] for p in parts for split in p.splits]
        if wal_idx in self.batch_files:
            # replay determinism: same (start, end) -> same file set
            assert sorted(got) == sorted(self.batch_files[wal_idx])
        self.batch_files[wal_idx] = got

    def _end(self):
        return self.wal[-1][1] if self.wal else None

    def _replay_uncommitted(self):
        if self.commits < len(self.wal):
            start, end = self.wal[-1]
            parts = self.reader.partitions(start, end)
            self._deliver(len(self.wal) - 1, parts)
            self.run_batches += 1
            self.reader.commit(end)
            self.commits = len(self.wal)

    def restart(self):
        self._new_reader()
        self.fresh = False
        self._replay_uncommitted()

    def run_one_batch(self, crash_before_partitions=False,
                      crash_before_commit=False):
        """Returns True if a batch was planned."""
        self._replay_uncommitted()
        latest = self.reader.latestOffset()
        start = self._end()
        if start is None:
            start = self.reader.initialOffset()
        if latest == start:
            return False
        self.wal.append((start, latest))
        if crash_before_partitions:
            self.restart()
            return True
        parts = self.reader.partitions(start, latest)
        new = sum(len(p.splits) for p in parts)
        self.batch_new_counts.append((self.run_batches, new))
        self.run_batches += 1
        self._deliver(len(self.wal) - 1, parts)
        if crash_before_commit:
            self.restart()
            return True
        self.reader.commit(latest)
        self.commits = len(self.wal)
        return True

    def drain(self):
        for _ in range(200):
            if not self.run_one_batch():
                return
        raise AssertionError("drain did not converge")


def _mkfile(src, i):
    p = os.path.join(str(src), f"f{i:03d}.xml")
    with open(p, "w") as fh:
        fh.write(f"<rs><r><a>{i}</a></r></rs>")
    return p


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_admission_exactly_once_and_capped(tmp_path_factory, data):
    """Randomized schedule of file arrivals, batches, crashes and
    restarts: no file is ever delivered twice or lost, and with the
    cursor every batch stays within the cap."""
    base = tmp_path_factory.mktemp("adm")
    src = base / "src"
    src.mkdir()
    cap = data.draw(st.integers(1, 3), label="cap")
    cursor = data.draw(st.booleans(), label="cursor")
    sim = EngineSim(src, cap, cursor)
    n_files = 0
    for step in data.draw(
        st.lists(
            st.sampled_from(
                ["add", "add", "batch", "batch", "crash_pre", "crash_mid",
                 "restart"]
            ),
            min_size=4,
            max_size=25,
        ),
        label="script",
    ):
        if step == "add":
            _mkfile(src, n_files)
            n_files += 1
        elif step == "batch":
            sim.run_one_batch()
        elif step == "crash_pre":
            sim.run_one_batch(crash_before_partitions=True)
        elif step == "crash_mid":
            sim.run_one_batch(crash_before_commit=True)
        elif step == "restart":
            sim.restart()
    sim.drain()

    expected = sorted(
        os.path.join(str(src), f) for f in os.listdir(src)
    )
    delivered = [f for files in sim.batch_files.values() for f in files]
    assert sorted(delivered) == expected  # exactly-once, no loss
    for run_batch_idx, new in sim.batch_new_counts:
        if cursor:
            assert new <= cap, (run_batch_idx, new)
        elif run_batch_idx > 0:
            # without the cursor only a run's FIRST batch may exceed
            assert new <= cap, (run_batch_idx, new)


def test_checkpoint_option_autoderives_cursor_capped_batch0(tmp_path):
    """With a cap set and ``checkpointLocation`` passed to the READER (no
    explicit admissionCursorPath), the cursor auto-derives under the
    checkpoint dir: a fresh query over a pre-existing backlog gets a
    CAPPED batch 0, and a crash-restart with the same checkpoint stays
    capped and exactly-once."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    for i in range(7):
        _mkfile(src, i)
    sim = EngineSim(src, cap=2, cursor=False)
    sim.opts["checkpointLocation"] = str(ckpt)
    sim._new_reader()

    sim.run_one_batch()
    # fresh backlog start, no explicit cursor option: batch 0 is capped
    assert sim.batch_new_counts[0][1] == 2
    derived = [
        p for p in ckpt.iterdir()
        if p.name.startswith("xml_graft_admission_cursor-")
    ]
    assert len(derived) == 1  # per-source namespaced cursor file

    sim.run_one_batch(crash_before_commit=True)  # replay via restart
    sim.drain()
    delivered = [f for files in sim.batch_files.values() for f in files]
    expected = sorted(os.path.join(str(src), f) for f in os.listdir(src))
    assert sorted(delivered) == expected  # exactly-once, no loss
    for _idx, new in sim.batch_new_counts:
        assert new <= 2  # EVERY batch capped, batch 0 included


def test_cursor_file_written_at_partitions_time(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    sim = EngineSim(src, cap=2, cursor=True)
    for i in range(3):
        _mkfile(src, i)
    sim.run_one_batch()
    cursor = os.path.join(str(src), "..", "cursor.json")
    files = json.load(open(cursor))["files"]
    assert len(files) == 2  # the planned position, not the full snapshot


def test_derived_cursor_namespaced_per_source(tmp_path):
    """Two capped readers sharing one checkpointLocation (a union query)
    must derive DISTINCT cursor files — a shared file would let each
    overwrite the other's admitted position (skip/re-admit on restart).
    The same reader config re-derives the same name across restarts."""
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def mk(path, cap="2"):
        return XmlStreamReader(
            {"path": str(path), "rowTag": "r", "maxFilesPerTrigger": cap,
             "checkpointLocation": ckpt},
            SCHEMA,
        )

    ra, rb = mk(a), mk(b)
    assert ra._cursor_path != rb._cursor_path
    assert os.path.dirname(ra._cursor_path) == ckpt
    assert os.path.basename(ra._cursor_path).startswith(
        "xml_graft_admission_cursor-"
    )
    # stable across restarts of the same source ...
    assert mk(a)._cursor_path == ra._cursor_path
    # ... and distinct when only the cap differs (different admission
    # semantics must not resume from each other's position)
    assert mk(a, cap="3")._cursor_path != ra._cursor_path

    # ADVICE r10: options that shape the snapshot/admission BEYOND the
    # caps must namespace too — two glob subsets of ONE directory, or
    # recursive vs flat listing, or latestFirst admission order, see
    # different file sets/orders and must not clobber each other
    def mkopt(**extra):
        return XmlStreamReader(
            {"path": str(a), "rowTag": "r", "maxFilesPerTrigger": "2",
             "checkpointLocation": ckpt, **extra},
            SCHEMA,
        )

    base = mkopt()._cursor_path
    assert mkopt(pathGlobFilter="x*.xml")._cursor_path != base
    assert mkopt(pathGlobFilter="y*.xml")._cursor_path != \
        mkopt(pathGlobFilter="x*.xml")._cursor_path
    assert mkopt(recursiveFileLookup="true")._cursor_path != base
    assert mkopt(latestFirst="true")._cursor_path != base
    # case-insensitive spellings of the SAME option re-derive the same
    # cursor (one reader restarted with equivalent options must resume)
    assert mkopt(pathglobfilter="x*.xml")._cursor_path == \
        mkopt(pathGlobFilter="x*.xml")._cursor_path
