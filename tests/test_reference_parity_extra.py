"""Golden parity cases ported from XmlSuite.scala over previously
unexercised reference fixtures: attribute+value structs, struct-vs-string
widening, newline-separated attributes, whitespace/null semantics with
explicit schemas, nested objects/arrays, parent-named nested elements,
and unindented documents."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_xml_spark.sources.api import read_xml
from spark_xml_spark.xmlcore import tokenizer

RES = "/root/reference/src/test/resources"


def test_ages_attribute_in_value_struct(spark):
    """XmlSuite 'elements in array having attributes': <age born="...">25</age>
    infers {_VALUE long, _born date}; attribute dates parse exactly."""
    df = read_xml(spark, f"{RES}/ages.xml", rowTag="person")
    rows = df.orderBy("name").collect()
    assert len(rows) == 3
    by_name = {r["name"]: r["age"] for r in rows}
    assert by_name["Hyukjin"]["_born"] == datetime.date(1990, 2, 24)
    assert by_name["Lars"]["_born"] == datetime.date(1985, 1, 1)
    assert by_name["Hyukjin"]["_VALUE"] == 25


def test_ages_mixed_struct_and_string(spark):
    """XmlSuite 'mixed elements (struct, string)': name is sometimes
    <name>Lars</name>, sometimes <name><firstName>..</firstName></name> —
    the widened schema still yields 3 rows."""
    df = read_xml(spark, f"{RES}/ages-mixed-types.xml", rowTag="person")
    assert df.count() == 3


@pytest.mark.parametrize(
    "file",
    [
        "attributesStartWithNewLine.xml",
        "attributesStartWithNewLineCR.xml",
        "attributesStartWithNewLineLF.xml",
    ],
)
def test_attributes_separated_by_newlines(spark, file):
    """XmlSuite newline-attribute trio: start tags whose attributes are
    split across LF/CR/CRLF lines must still tokenize and parse."""
    df = read_xml(
        spark, f"{RES}/{file}", rowTag="note",
        ignoreNamespace="true", excludeAttribute="false",
    )
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["to"] == "Tove" and r["from"] == "Jani"
    assert r["heading"] == "Reminder"
    assert r["body"].startswith("Don't forget")


def test_null_numbers_whitespace_preserved_and_empty_as_null(spark):
    """XmlSuite 'nullable fields' + 'empty string as null': with a string
    schema bob's whitespace-only age survives verbatim; with
    treatEmptyValuesAsNulls and an int schema it becomes null."""
    schema = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("age", T.StringType()),
        ]
    )
    rows = read_xml(
        spark, f"{RES}/null-numbers.xml", rowTag="ROW", schema=schema
    ).orderBy("name").collect()
    assert [(r["name"], r["age"]) for r in rows] == [
        ("alice", "35"), ("bob", "    "), ("coc", "24"),
    ]

    schema_int = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("age", T.IntegerType()),
        ]
    )
    rows = read_xml(
        spark, f"{RES}/null-numbers.xml", rowTag="ROW", schema=schema_int,
        treatEmptyValuesAsNulls="true", ignoreSurroundingSpaces="true",
    ).orderBy("name").collect()
    assert [(r["name"], r["age"]) for r in rows] == [
        ("alice", 35), ("bob", None), ("coc", 24),
    ]


def test_null_numbers_2_empty_attribute_nullvalue(spark):
    """XmlSuite null-numbers-2: nullValue='' turns Volume='' into null
    inside an exploded attribute struct."""
    schema = T.StructType(
        [
            T.StructField(
                "T",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("_Number", T.LongType()),
                            T.StructField("_VALUE", T.DoubleType()),
                            T.StructField("_Volume", T.DoubleType()),
                        ]
                    )
                ),
            )
        ]
    )
    df = read_xml(
        spark, f"{RES}/null-numbers-2.xml", rowTag="TEST",
        schema=schema, nullValue="",
    ).select(F.explode("T").alias("t"))
    rows = df.collect()
    assert rows[0]["t"]["_Volume"] == 20.0
    assert rows[1]["t"]["_Volume"] is None


def test_null_nested_struct_2_empty_vs_missing(spark):
    """XmlSuite 'empty vs non-existent rows': five precise shapes of
    absent / empty / whitespace / value nested structs."""
    schema = T.StructType(
        [
            T.StructField(
                "b",
                T.StructType(
                    [
                        T.StructField(
                            "es",
                            T.StructType(
                                [
                                    T.StructField("e", T.StringType()),
                                    T.StructField("f", T.StringType()),
                                ]
                            ),
                        )
                    ]
                ),
            )
        ]
    )
    rows = read_xml(
        spark, f"{RES}/null-nested-struct-2.xml", rowTag="item", schema=schema
    ).collect()
    vals = [r["b"] and (r["b"]["es"] and tuple(r["b"]["es"])) for r in rows]
    assert vals[0] is None  # <b> empty -> es null
    assert vals[1] == (None, None)  # <es> exists, both children absent
    assert vals[2] == ("E", None)
    assert vals[3] == ("E", " ")
    assert vals[4] == ("E", "")


def test_simple_nested_objects_schema_order(spark):
    """XmlSuite 'correct order of columns for nested rows': a user schema
    declaring (b, a) in non-document order still maps values by NAME."""
    schema = T.StructType(
        [
            T.StructField(
                "c",
                T.StructType(
                    [
                        T.StructField("b", T.IntegerType()),
                        T.StructField("a", T.IntegerType()),
                    ]
                ),
            )
        ]
    )
    row = (
        read_xml(
            spark, f"{RES}/simple-nested-objects.xml", rowTag="ROW",
            schema=schema,
        )
        .select("c.a", "c.b")
        .first()
    )
    assert (row["a"], row["b"]) == (111, 222)


def test_books_nested_object_schema(spark):
    """XmlSuite 'schema (object) inferred correctly'."""
    df = read_xml(spark, f"{RES}/books-nested-object.xml", rowTag="book")
    assert df.count() == 12
    f = dict((fld.name, fld.dataType) for fld in df.schema.fields)
    assert isinstance(f["publish_dates"], T.StructType)
    assert f["publish_dates"]["publish_date"].dataType == T.DateType()
    assert f["price"] == T.DoubleType()
    assert f["_id"] == T.StringType()


def test_books_nested_array_schema(spark):
    """XmlSuite 'schema (array) inferred correctly': repeated publish_date
    siblings infer as array<date>."""
    df = read_xml(spark, f"{RES}/books-nested-array.xml", rowTag="book")
    assert df.count() == 12
    f = dict((fld.name, fld.dataType) for fld in df.schema.fields)
    assert f["publish_date"] == T.ArrayType(T.DateType())


def test_nested_element_named_like_parent(spark):
    """XmlSuite parent-name trio: <parent><parent>..</parent>..</parent>
    must tokenize as TWO records (depth counting) and infer
    child + parent-struct."""
    for file in (
        "nested-element-with-name-of-parent.xml",
        "nested-element-with-attributes-and-name-of-parent.xml",
    ):
        path = f"{RES}/{file}"
        lines = [ln.strip() for ln in open(path).read().splitlines()]
        splits = tokenizer.plan_splits(path, target_split_size=1 << 30)
        recs = [r for s in splits for r in tokenizer.scan_split(s, "parent")]
        assert recs == [lines[2], lines[3]], file

    df = read_xml(
        spark, f"{RES}/nested-element-with-name-of-parent.xml", rowTag="parent"
    )
    f = dict((fld.name, fld.dataType) for fld in df.schema.fields)
    assert f["child"] == T.StringType()
    assert isinstance(f["parent"], T.StructType)
    assert f["parent"]["child"].dataType == T.StringType()


def test_cars_no_indentation(spark):
    """XmlSuite 'files without indentation': records on one physical line."""
    df = read_xml(spark, f"{RES}/cars-no-indentation.xml", rowTag="ROW")
    assert {r["model"] for r in df.select("model").collect()} == {
        "S", "E350", "Volt",
    }


def test_gps_empty_field(spark):
    """XmlSuite 'unbalanced datatypes': empty nested extension elements
    with treatEmptyValuesAsNulls still yield both rows."""
    df = read_xml(
        spark, f"{RES}/gps-empty-field.xml", rowTag="ROW",
        treatEmptyValuesAsNulls="true",
    )
    assert df.count() == 2


def test_malformed_attributes_dropmalformed(spark):
    """XmlSuite 'malformed attributes': DROPMALFORMED keeps the 2 valid
    books by _id."""
    df = read_xml(
        spark, f"{RES}/books-malformed-attributes.xml", rowTag="book",
        mode="DROPMALFORMED",
    )
    rows = df.collect()
    assert len(rows) == 2
    assert sorted(r["_id"] for r in rows) == ["bk111", "bk112"]


def test_complicated_null_attribute_roundtrip(spark, tmp_path):
    """XmlSuite write-roundtrip over books-complicated-null-attribute:
    copy equals original as a set."""
    from spark_xml_spark.sources.api import write_xml

    books = read_xml(
        spark, f"{RES}/books-complicated-null-attribute.xml", rowTag="book"
    )
    out = str(tmp_path / "books-copy")
    write_xml(books, out, rootTag="books", rowTag="book")
    copy = read_xml(spark, out, rowTag="book")
    assert copy.count() == books.count()
    cols = sorted(books.columns)
    assert {str(tuple(r)) for r in copy.select(*cols).collect()} == {
        str(tuple(r)) for r in books.select(*cols).collect()
    }


def test_datatypes_permissive_partial_results(spark):
    """XmlSuite 'nulls out invalid values ... permissive': the valid row
    parses fully (incl. a MapType column); the invalid row keeps the
    parseable fields (string, the valid array element) and captures the
    raw record in the custom-named corrupt column."""
    schema = T.StructType(
        [
            T.StructField(
                "integer_value",
                T.StructType(
                    [
                        T.StructField("_VALUE", T.IntegerType()),
                        T.StructField("_int", T.IntegerType()),
                    ]
                ),
            ),
            T.StructField(
                "long_value",
                T.StructType(
                    [
                        T.StructField("_VALUE", T.LongType()),
                        T.StructField("_int", T.StringType()),
                    ]
                ),
            ),
            T.StructField("float_value", T.FloatType()),
            T.StructField("double_value", T.DoubleType()),
            T.StructField("boolean_value", T.BooleanType()),
            T.StructField("string_value", T.StringType()),
            T.StructField("integer_array", T.ArrayType(T.IntegerType())),
            T.StructField(
                "integer_map", T.MapType(T.StringType(), T.IntegerType())
            ),
            T.StructField("_malformed_records", T.StringType()),
        ]
    )
    df = read_xml(
        spark, f"{RES}/datatypes-valid-and-invalid.xml", rowTag="ROW",
        schema=schema, mode="PERMISSIVE",
        columnNameOfCorruptRecord="_malformed_records",
    )
    assert df.schema == schema
    valid, invalid = df.collect()[:2]
    assert tuple(valid["integer_value"]) == (10, 10)
    assert tuple(valid["long_value"]) == (10, "Ten")
    assert (valid["float_value"], valid["double_value"]) == (10.0, 10.0)
    assert valid["boolean_value"] is True
    assert valid["string_value"] == "Ten"
    assert list(valid["integer_array"]) == [1, 2]
    assert dict(valid["integer_map"]) == {"a": 123, "b": 345}
    assert valid["_malformed_records"] is None

    assert invalid["integer_value"] is None
    assert invalid["long_value"] is None
    assert invalid["float_value"] is None
    assert invalid["boolean_value"] is None
    assert invalid["string_value"] == "Ten"
    assert list(invalid["integer_array"]) == [2]
    assert invalid["integer_map"] is None
    assert 'int="Ten"' in invalid["_malformed_records"]


def test_mixed_children_as_string_schema(spark):
    """XmlSuite Issue 614: a mixed-content element read with a STRING
    schema keeps its inner markup verbatim."""
    text = (
        read_xml(
            spark, f"{RES}/mixed_children_as_string.xml", rowTag="book",
            schema=T.StructType([T.StructField("text", T.StringType())]),
        )
        .select("text")
        .first()["text"]
    )
    assert "Ut <i>voluptas</i> distinctio et impedit deserunt" in text
    assert "<i>numquam</i> incidunt cum autem temporibus." in text


def test_unbalanced_elements_explicit_schema(spark):
    """XmlSuite 'unbalanced elements': rows with missing fields still
    count under an explicit schema."""
    schema = T.StructType(
        [
            T.StructField("color", T.StringType()),
            T.StructField("comment", T.StringType()),
            T.StructField("year", T.IntegerType()),
        ]
    )
    df = read_xml(
        spark, f"{RES}/cars-unbalanced-elements.xml", rowTag="ROW",
        schema=schema,
    )
    assert df.count() == 3


def test_missing_nested_struct_is_row_of_nulls(spark):
    """XmlSuite Issue 117: <es></es> parses as a struct of nulls, not a
    null struct."""
    rows = (
        read_xml(spark, f"{RES}/null-nested-struct.xml", rowTag="item")
        .select("b.es")
        .collect()
    )
    assert rows[1]["es"] is not None
    assert rows[1]["es"][0] is None


def test_mixed_children_2_values(spark):
    """XmlSuite 'mixed text and complex element children'."""
    df = read_xml(spark, f"{RES}/mixed_children_2.xml", rowTag="root")
    assert df.select("foo.bar").first()[0] == " lorem "
    assert df.select("foo.baz.bing").first()[0] == 2
    assert df.select("missing").first()[0] == " ipsum "


def test_reference_compressed_fixtures(spark):
    """The reference's own pre-compressed fixtures read transparently."""
    plain = read_xml(spark, f"{RES}/cars.xml", rowTag="ROW")
    expect = {tuple(r) for r in plain.select(*sorted(plain.columns)).collect()}
    for f in ("cars.xml.gz", "cars.xml.bz2"):
        df = read_xml(spark, f"{RES}/{f}", rowTag="ROW")
        got = {tuple(r) for r in df.select(*sorted(df.columns)).collect()}
        assert got == expect, f


def test_mixed_attr_no_child_widening(spark):
    """XmlSuite 'mixed elements (attributes, no child)': <date> is a
    valueTag struct in one row, a nested struct in another, absent in the
    third; the widened schema keeps the _type attribute per row."""
    df = read_xml(spark, f"{RES}/cars-mixed-attr-no-child.xml", rowTag="ROW")
    rows = df.orderBy("model").collect()
    assert len(rows) == 3
    by_model = {r["model"]: r for r in rows}
    assert by_model["S"]["date"]["_type"] == "string"
    assert by_model["E350"]["date"]["_type"] == "struct"
    assert by_model["Volt"]["date"] is None


def test_fias_house_bz2_small_matches_plain(spark):
    """The reference's small fias bz2 fixture reads identically to its
    uncompressed twin (the .large variants are covered by the
    partitioning suite)."""
    plain = read_xml(spark, f"{RES}/fias_house.xml", rowTag="House")
    comp = read_xml(spark, f"{RES}/fias_house.xml.bz2", rowTag="House")
    cols = sorted(plain.columns)
    assert comp.count() == plain.count() == 37
    assert {tuple(r) for r in comp.select(*cols).collect()} == {
        tuple(r) for r in plain.select(*cols).collect()
    }


def test_manual_schema_corrupt_record_permissive(spark):
    """XmlSuite.scala:1298-1346 (#517): a user schema WITH a corrupt-record
    column on PERMISSIVE mode — the record fails to parse (c192='M' as
    double), so the whole malformed row lands in _corrupt_record."""
    from pyspark.sql import types as T

    from spark_xml_spark.sources.api import read_xml

    def arr_vt():
        return T.ArrayType(T.StructType([
            T.StructField("_VALUE", T.StringType()),
            T.StructField("_m", T.IntegerType()),
        ]))

    schema = T.StructType(
        [T.StructField("_id", T.StringType()),
         T.StructField("_space", T.StringType()),
         T.StructField("c2", T.DoubleType()),
         T.StructField("c3", T.StringType()),
         T.StructField("c4", T.StringType()),
         T.StructField("c5", T.StringType()),
         T.StructField("c6", T.StringType()),
         T.StructField("c7", T.StringType()),
         T.StructField("c8", T.StringType()),
         T.StructField("c9", T.DoubleType()),
         T.StructField("c11", T.DoubleType()),
         T.StructField("c20", arr_vt()),
         T.StructField("c46", T.StringType()),
         T.StructField("c76", T.StringType()),
         T.StructField("c78", T.StringType()),
         T.StructField("c85", T.DoubleType()),
         T.StructField("c93", T.StringType()),
         T.StructField("c95", T.StringType()),
         T.StructField("c99", arr_vt()),
         T.StructField("c100", arr_vt()),
         T.StructField("c108", T.StringType()),
         T.StructField("c192", T.DoubleType()),
         T.StructField("c193", T.StringType()),
         T.StructField("c194", T.StringType()),
         T.StructField("c195", T.StringType()),
         T.StructField("c196", T.StringType()),
         T.StructField("c197", T.DoubleType()),
         T.StructField("_corrupt_record", T.StringType())]
    )
    df = read_xml(
        spark,
        "/root/reference/src/test/resources/manual_schema_corrupt_record.xml",
        schema=schema,
        rowTag="row",
    )
    row = df.collect()[0]
    assert row["_corrupt_record"] is not None


def test_read_xml_strings_xml_dataset_parity(spark):
    """XmlReader.scala:147-204 (xmlDataset/xmlRdd): parse a dataset of XML
    record strings with inferred or explicit schema; DROPMALFORMED drops
    rows at the dataset level (a column can only null them)."""
    from spark_xml_spark.functions import read_xml_strings

    frags = [
        "<r><id>1</id><name>a</name></r>",
        "<r><id>2</id><name>b</name></r>",
        "<r><id>not-an-int</id><name>c</name></r>",
    ]
    # inferred schema: id widens to string over the corpus -> all rows parse
    df = read_xml_strings(spark, frags, options={"rowTag": "r"})
    assert sorted((r.id, r.name) for r in df.collect()) == [
        ("1", "a"), ("2", "b"), ("not-an-int", "c")
    ]
    # explicit schema + DROPMALFORMED: the unparsable row is GONE
    out = read_xml_strings(
        spark,
        spark.createDataFrame([(f,) for f in frags], "xml string"),
        column="xml",
        schema="id bigint, name string",
        options={"rowTag": "r", "mode": "DROPMALFORMED"},
    )
    assert sorted((r.id, r.name) for r in out.collect()) == [(1, "a"), (2, "b")]
    assert out.columns == ["id", "name"]
