"""Structured Streaming support for the XML data source.

The reference has no streaming surface (SURVEY.md §2.2: streaming absent);
this is part of the Spark-first extension mandated by the build plan
(SURVEY.md §7 phase 6): ``spark.readStream.format("xml-graft")`` tails a
directory for new XML files, ``df.writeStream.format("xml-graft")`` emits
one XML document per partition per microbatch.

Exports resolve LAZILY (PEP 562): the Python DataSource streaming runner
spawns a FRESH interpreter per stream start and unpickling
``XmlStreamReader`` imports ``spark_xml_spark.streaming.source`` — which
first executes this package ``__init__``. The eager form imported
``streaming.dedup`` (and through it pandas, ~0.9 s) plus ``joins`` and
``foreach`` into every such interpreter, none of which the source path
touches; that import tax was ~85 % of the measured 1.4 s module-import
cost on the per-stream-start floor (OPTIMIZATION_r16.md). Public API is
unchanged: ``from spark_xml_spark.streaming import dedup_stream`` still
works, it just pays its own import cost at first use.
"""

_EXPORTS = {
    "XmlStreamReader": "spark_xml_spark.streaming.source",
    "XmlStreamWriter": "spark_xml_spark.streaming.source",
    "check_checkpoint_encoding": "spark_xml_spark.streaming.dedup",
    "dedup_stream": "spark_xml_spark.streaming.dedup",
    "dedup_stream_exact": "spark_xml_spark.streaming.dedup",
    "idempotent_parquet_writer": "spark_xml_spark.streaming.foreach",
    "read_batches": "spark_xml_spark.streaming.foreach",
    "stream_stream_interval_join": "spark_xml_spark.streaming.joins",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    target = _EXPORTS.get(name)
    if target is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        )
    import importlib

    value = getattr(importlib.import_module(target), name)
    globals()[name] = value  # cache: subsequent lookups skip __getattr__
    return value


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
