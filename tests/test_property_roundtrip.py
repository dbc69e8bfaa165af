"""Property-based write->tokenize->parse roundtrip over randomized rows of
all supported scalar types plus arrays and nested structs (the SURVEY §5
testing-plan item the reference approximates with
StaxXmlGeneratorSuite.scala:67-108).

Library-level (no Spark session): generator.rows_to_document ->
tokenizer.scan_string -> parser.parse_record must reproduce the input
exactly under the explicit schema.
"""

import datetime
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from spark_xml_spark.options import XmlOptions
from spark_xml_spark.xmlcore import generator, parser, tokenizer

# XML 1.0 cannot carry control characters; the reference inherits the same
# restriction from its XML writer.
_text = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x2FF, blacklist_characters="\x7f"
    ),
    max_size=40,
)
_longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_doubles = st.floats(allow_nan=False, allow_infinity=True, width=64)
_dates = st.dates(
    min_value=datetime.date(1, 1, 1), max_value=datetime.date(9999, 12, 31)
)
_timestamps = st.datetimes(
    min_value=datetime.datetime(1, 1, 1), max_value=datetime.datetime(9999, 12, 28)
)

SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType()),
        T.StructField("l", T.LongType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("dt", T.DateType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
        T.StructField(
            "nested",
            T.StructType(
                [
                    T.StructField("x", T.StringType()),
                    T.StructField("y", T.DoubleType()),
                ]
            ),
        ),
    ]
)

_row = st.tuples(
    st.one_of(st.none(), _text),
    st.one_of(st.none(), _longs),
    st.one_of(st.none(), _doubles),
    st.one_of(st.none(), st.booleans()),
    st.one_of(st.none(), _dates),
    st.one_of(st.none(), _timestamps),
    st.one_of(st.none(), st.lists(_longs, max_size=4)),
    st.one_of(st.none(), st.tuples(st.one_of(st.none(), _text), st.one_of(st.none(), _doubles))),
)


def _normalize(row):
    """Expected parse result for a generated row: null-elision semantics
    turn a missing array into None and an all-null nested struct stays a
    struct of nulls only when the element was written."""
    s, l, d, b, dt, ts, arr, nested = row
    if ts is not None and ts.tzinfo is None:
        ts = ts  # naive in == naive out (UTC environment)
    if arr is not None and len(arr) == 0:
        arr = None  # zero elements -> nothing written -> null
    return (s, l, d, b, dt, ts, arr, nested)


@settings(max_examples=150, deadline=None)
@given(rows=st.lists(_row, min_size=1, max_size=8))
def test_roundtrip_property(rows):
    xo = XmlOptions.from_dict({"rowTag": "r", "rootTag": "rs"})
    doc = "\n".join(generator.rows_to_document(SCHEMA, rows, xo))
    recs = list(tokenizer.scan_string(doc, "r"))
    assert len(recs) == len(rows)
    for rec, row in zip(recs, rows):
        got = parser.parse_record(rec, SCHEMA, xo, mode="FAILFAST")
        expected = _normalize(row)
        assert len(got) == len(expected)
        for g, e, f in zip(got, expected, SCHEMA.fields):
            if isinstance(f.dataType, T.DoubleType) and e is not None:
                assert g == e or (math.isinf(e) and g == e)
            elif f.name == "nested" and e is not None:
                ge = tuple(g) if g is not None else None
                assert ge == tuple(e), f"nested: {ge!r} != {e!r}"
            else:
                assert g == e, f"{f.name}: {g!r} != {e!r}"
