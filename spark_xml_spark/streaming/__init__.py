"""Structured Streaming support for the XML data source.

The reference has no streaming surface (SURVEY.md §2.2: streaming absent);
this is part of the Spark-first extension mandated by the build plan
(SURVEY.md §7 phase 6): ``spark.readStream.format("xml-graft")`` tails a
directory for new XML files, ``df.writeStream.format("xml-graft")`` emits
one XML document per partition per microbatch.
"""

from spark_xml_spark.streaming.dedup import (
    check_checkpoint_encoding,
    dedup_stream,
    dedup_stream_exact,
)
from spark_xml_spark.streaming.joins import stream_stream_interval_join
from spark_xml_spark.streaming.foreach import (
    idempotent_parquet_writer,
    read_batches,
)
from spark_xml_spark.streaming.source import XmlStreamReader, XmlStreamWriter

__all__ = [
    "XmlStreamReader",
    "XmlStreamWriter",
    "check_checkpoint_encoding",
    "dedup_stream",
    "dedup_stream_exact",
    "idempotent_parquet_writer",
    "read_batches",
    "stream_stream_interval_join",
]
