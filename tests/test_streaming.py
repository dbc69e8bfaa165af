"""Structured Streaming XML source/sink tests: file tailing with offset
tracking (only new files per batch) and per-batch XML document output."""

import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_xml_spark.sources.api import read_xml, register

SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
    ]
)


def _write_doc(path, rows):
    with open(path, "w") as fh:
        fh.write("<ROWS>\n")
        for a, b in rows:
            fh.write(f"<ROW><a>{a}</a><b>{b}</b></ROW>\n")
        fh.write("</ROWS>\n")


def test_stream_read_tails_new_files(spark, tmp_path):
    register(spark)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out_parquet")
    _write_doc(src / "f1.xml", [(1, "x"), (2, "y")])

    def run_batch():
        q = (
            spark.readStream.format("xml-graft")
            .schema(SCHEMA)
            .option("rowTag", "ROW")
            .option("path", str(src))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "x"), (2, "y")}

    # a second file appears; the checkpointed offset means only IT is read
    _write_doc(src / "f2.xml", [(3, "z")])
    run_batch()
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "x"), (2, "y"), (3, "z")}


def test_stream_write_xml_sink(spark, tmp_path):
    register(spark)
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    _write_doc(src / "f1.xml", [(10, "p"), (11, "q")])
    q = (
        spark.readStream.format("xml-graft")
        .schema(SCHEMA)
        .option("rowTag", "ROW")
        .option("path", str(src))
        .load()
        .writeStream.format("xml-graft")
        .option("path", out)
        .option("rowTag", "ROW")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    files = [f for f in os.listdir(out) if f.endswith(".xml")]
    assert files
    back = read_xml(spark, out, rowTag="ROW")
    got = {(r["a"], r["b"]) for r in back.collect()}
    assert got == {(10, "p"), (11, "q")}
