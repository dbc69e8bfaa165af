"""Reference-parity tests ported from XmlSuite.scala against the original
fixtures (read-only at /root/reference/src/test/resources). Each test cites
the XmlSuite line it mirrors."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_xml_spark.sources.api import read_xml

RES = "/root/reference/src/test/resources"
UTC = datetime.timezone.utc


def _epoch_ms(dt: datetime.datetime) -> int:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=UTC)
    return int(dt.timestamp() * 1000)


def test_iso_8859_1_charset(spark):
    """XmlSuite.scala:137-147."""
    df = read_xml(spark, f"{RES}/cars-iso-8859-1.xml", charset="ISO-8859-1")
    assert df.select("year").count() == 3
    got = df.select("comment", "year").where(F.col("year") == 2012).first()
    assert got == Row(comment="No comment", year=2012)


def test_null_numbers_string_schema(spark):
    """XmlSuite.scala:676-686: with a string schema the whitespace age
    survives verbatim."""
    schema = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("age", T.StringType()),
        ]
    )
    rows = read_xml(spark, f"{RES}/null-numbers.xml", schema=schema, rowTag="ROW").collect()
    assert (rows[0]["name"], rows[0]["age"]) == ("alice", "35")
    assert (rows[1]["name"], rows[1]["age"]) == ("bob", "    ")
    assert (rows[2]["name"], rows[2]["age"]) == ("coc", "24")


def test_null_numbers_treat_empty_as_null(spark):
    """XmlSuite.scala:688-698."""
    schema = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("age", T.IntegerType()),
        ]
    )
    rows = read_xml(
        spark,
        f"{RES}/null-numbers.xml",
        schema=schema,
        rowTag="ROW",
        treatEmptyValuesAsNulls=True,
        ignoreSurroundingSpaces=True,
    ).collect()
    assert rows[1]["age"] is None


def test_topics_namespaces(spark):
    """XmlSuite.scala:700-706: namespace-unaware parse still yields rows."""
    rows = read_xml(spark, f"{RES}/topics-namespaces.xml", rowTag="Topic").collect()
    assert len(rows) == 1


def test_ignore_namespace_books(spark):
    """XmlSuite.scala:1270-1277."""
    df = read_xml(
        spark, f"{RES}/books-namespaces.xml", rowTag="book", ignoreNamespace=True
    )
    assert df.filter("author IS NOT NULL").count() == 3
    assert df.filter("_id IS NOT NULL").count() == 3


def test_ignore_surrounding_spaces_strings(spark):
    """XmlSuite.scala:908-916 (feed-with-spaces)."""
    df = read_xml(
        spark, f"{RES}/feed-with-spaces.xml", rowTag="entry", ignoreSurroundingSpaces=True
    )
    got = [r[0] for r in df.collect()]
    assert got == ["A", "B", "C", "D"]


def test_ignore_surrounding_spaces_non_string(spark):
    """XmlSuite.scala:917-928 (ages-with-spaces)."""
    rows = read_xml(
        spark, f"{RES}/ages-with-spaces.xml", rowTag="person", ignoreSurroundingSpaces=True
    ).collect()
    assert len(rows) == 3
    assert str(rows[0]["age"]["_born"]) == "1990-02-24"
    assert rows[1]["age"]["_VALUE"] == 30


def test_self_closing_tag_with_schema(spark):
    """XmlSuite.scala:970-981."""
    schema = T.StructType(
        [
            T.StructField("non-empty-tag", T.IntegerType()),
            T.StructField("self-closing-tag", T.IntegerType()),
        ]
    )
    rows = read_xml(spark, f"{RES}/self-closing-tag.xml", schema=schema, rowTag="ROW").collect()
    assert rows[0] == Row(**{"non-empty-tag": 1, "self-closing-tag": None})


def test_text_column_infer_strategies(spark):
    """XmlSuite.scala:1045-1060: inferSchema=false keeps '00010' a string,
    true infers integer 10."""
    text = read_xml(spark, f"{RES}/textColumn.xml", rowTag="ROW", inferSchema=False)
    assert text.first()["col1"] == "00010"
    default = read_xml(spark, f"{RES}/textColumn.xml", rowTag="ROW")
    assert default.first()["col1"] == 10


def test_processing_instruction(spark):
    """XmlSuite.scala:1063-1069."""
    assert read_xml(spark, f"{RES}/processing.xml", rowTag="foo").count() == 1


def test_mixed_children(spark):
    """XmlSuite.scala:1072-1080: character data ignored when a complex
    child follows; kept when schema is string."""
    row = read_xml(spark, f"{RES}/mixed_children.xml", rowTag="root").first()
    assert list(row[0]) == [" lorem "]
    assert row[1] == " ipsum "


def test_null_empty_string_option(spark):
    """XmlSuite.scala:1038-1043: nullValue='' maps empty color to null."""
    fruit = read_xml(spark, f"{RES}/null-empty-string.xml", rowTag="row", nullValue="")
    assert fruit.first()["color"] is None


def test_empty_file_known_schema(spark):
    """XmlSuite.scala:256-262."""
    schema = T.StructType([T.StructField("column", T.StringType(), False)])
    assert read_xml(spark, f"{RES}/empty.xml", schema=schema, rowTag="ROW").count() == 0


def test_unclosed_tag_failfast(spark):
    """XmlSuite.scala:221-231: FAILFAST on an unclosed row raises."""
    with pytest.raises(Exception):
        read_xml(
            spark, f"{RES}/unclosed_tag.xml", rowTag="book", mode="FAILFAST"
        ).collect()


def test_corrupt_record_content_equality(spark):
    """XmlSuite.scala:233-254: the corrupt column holds the raw record."""
    df = read_xml(
        spark,
        f"{RES}/cars-malformed.xml",
        rowTag="ROW",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_malformed_records",
    )
    cars = df.collect()
    assert len(cars) == 3
    bad1 = df.select("_malformed_records").collect()[0][0].replace(" ", "").replace("\n", "")
    bad2 = df.select("_malformed_records").collect()[1][0].replace(" ", "").replace("\n", "")
    assert bad1 == (
        "<ROW><year>2012</year><make>Tesla</make><model>>S"
        "<comment>Nocomment</comment></ROW>"
    )
    assert bad2 == (
        "<ROW></year><make>Ford</make><model>E350</model>model></model>"
        "<comment>Gogetonenowtheyaregoingfast</comment></ROW>"
    )
    good = [r for r in cars if r["_malformed_records"] is None]
    assert len(good) == 1 and good[0]["make"] == "Chevy" and good[0]["year"] == 2015


def test_whitespace_error_corrupt(spark):
    """XmlSuite.scala:1225-1233."""
    schema = T.StructType(
        [
            T.StructField(
                "Book", T.StructType([T.StructField("Price", T.DoubleType())])
            ),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = read_xml(spark, f"{RES}/whitespace_error.xml", schema=schema, rowTag="Books")
    assert df.count() == 1
    assert df.first()["_corrupt_record"] is not None


def test_xml_string_field_preserves_attributes(spark):
    """XmlSuite.scala:1259-1267."""
    schema = T.StructType([T.StructField("ROW", T.StringType())])
    row = read_xml(
        spark, f"{RES}/cars-attribute.xml", schema=schema, rowTag="ROWSET"
    ).first()
    assert '<comment foo="bar">No</comment>' in row["ROW"]


def test_map_with_attributes(spark):
    """XmlSuite.scala:1279-1292."""
    schema = T.StructType(
        [
            T.StructField("_startTime", T.StringType()),
            T.StructField("_interval", T.StringType()),
            T.StructField("PMTarget", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    m = (
        read_xml(spark, f"{RES}/map-attribute.xml", schema=schema, rowTag="PMSetup")
        .select("PMTarget")
        .first()[0]
    )
    assert "_measurementType" in m and "M1" in m and "M2" in m


def test_struct_with_optional_child(spark):
    """XmlSuite.scala:1294-1297."""
    df = read_xml(spark, f"{RES}/struct_with_optional_child.xml", rowTag="Foo")
    assert df.selectExpr("SIZE(Bar)").first()[0] == 2


def test_date_inference_and_parse(spark):
    """XmlSuite.scala:1349-1366."""
    df = read_xml(spark, f"{RES}/date.xml", rowTag="book")
    assert [f.name for f in df.schema.fields] == ["author", "date", "date2"]
    assert isinstance(df.schema["date"].dataType, T.DateType)
    assert isinstance(df.schema["date2"].dataType, T.StringType)
    assert str(df.first()["date"]) == "2021-02-01"


def test_date_format_option(spark):
    """XmlSuite.scala:1395-1405."""
    df = read_xml(spark, f"{RES}/date.xml", rowTag="book", dateFormat="MM-dd-yyyy")
    assert isinstance(df.schema["date2"].dataType, T.DateType)
    assert str(df.first()["date2"]) == "2021-02-01"


def test_timestamp_inference(spark):
    """XmlSuite.scala:1368-1392."""
    df = read_xml(spark, f"{RES}/time.xml", rowTag="book")
    assert isinstance(df.schema["time"].dataType, T.TimestampType)
    assert isinstance(df.schema["time2"].dataType, T.StringType)
    assert _epoch_ms(df.first()["time"]) == 1322907330000


def test_timestamp_format_with_zone(spark):
    """XmlSuite.scala:1407-1424."""
    df = read_xml(
        spark,
        f"{RES}/time.xml",
        rowTag="book",
        timestampFormat="MM-dd-yyyy HH:mm:ss z",
    )
    assert isinstance(df.schema["time2"].dataType, T.TimestampType)
    row = df.first()
    assert _epoch_ms(row["time"]) == 1322907330000
    assert _epoch_ms(row["time2"]) == 1322936130000


def test_timestamp_format_without_zone(spark):
    """XmlSuite.scala:1426-1442: zoneless pattern -> session/UTC."""
    df = read_xml(
        spark,
        f"{RES}/time.xml",
        rowTag="book",
        timestampFormat="yyyy/MM/dd HH:mm:ss",
    )
    assert isinstance(df.schema["time3"].dataType, T.TimestampType)
    row = df.first()
    assert _epoch_ms(row["time3"]) == 1322892930000


def test_books_complicated_golden_schema(spark):
    """XmlSuite.scala golden-schema family (:506-649 analog): nested
    struct + array inference over books-complicated.xml."""
    df = read_xml(spark, f"{RES}/books-complicated.xml", rowTag="book")
    names = [f.name for f in df.schema.fields]
    assert names == sorted(names)
    genre = df.schema["genre"].dataType
    assert isinstance(genre, T.StructType)
    assert df.count() == 3


def test_unicode_tag_names(spark):
    """XmlFileSuite unicode rowTag (books-unicode-in-tag-name.xml)."""
    df = read_xml(spark, f"{RES}/books-unicode-in-tag-name.xml", rowTag="書")
    assert df.count() == 3
