"""Write-side reference-parity tests ported from XmlSuite.scala's DSL-save
family (:315-504, :1255-1268)."""

import glob
import gzip
import os

from pyspark.sql import Row
from pyspark.sql import types as T

from spark_xml_spark.sources.api import read_xml, write_xml

RES = "/root/reference/src/test/resources"


def _vals(v):
    """Nested positional values (Scala Row.toString compares values, not
    field names; Python Row str includes names, which differ by design in
    the custom-prefix roundtrips)."""
    if isinstance(v, Row):
        return tuple(_vals(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_vals(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _vals(x)) for k, x in v.items()))
    return v


def _part_lines(path, suffix=".xml"):
    files = sorted(glob.glob(os.path.join(path, f"part-*{suffix}")))
    assert files, f"no part files under {path}"
    if suffix.endswith(".gz"):
        with gzip.open(files[0], "rt") as fh:
            return fh.read().splitlines()
    with open(files[0]) as fh:
        return fh.read().splitlines()


def test_save_with_gzip_codec(spark, tmp_path):
    """XmlSuite.scala:315-348 (codec and shortened spelling)."""
    cars = read_xml(spark, f"{RES}/cars.xml", rowTag="ROW")
    for spelling in ("gzip", "gZiP"):
        out = str(tmp_path / f"cars-{spelling}")
        write_xml(cars.repartition(1), out, rowTag="ROW", compression=spelling)
        assert glob.glob(os.path.join(out, "*.xml.gz"))
        copy = read_xml(spark, out, rowTag="ROW")
        assert copy.count() == cars.count()
        assert {tuple(r) for r in copy.select(*sorted(cars.columns)).collect()} == {
            tuple(r) for r in cars.select(*sorted(cars.columns)).collect()
        }


def test_save_roundtrip_complicated(spark, tmp_path):
    """XmlSuite.scala:350-366: nested struct + array roundtrip."""
    books = read_xml(spark, f"{RES}/books-complicated.xml", rowTag="book")
    out = str(tmp_path / "books-copy")
    write_xml(books, out, rowTag="book", rootTag="books")
    copy = read_xml(spark, out, rowTag="book")
    assert copy.count() == books.count()
    a = {str(r) for r in books.collect()}
    b = {str(r) for r in copy.collect()}
    assert a == b


def test_save_declaration(spark, tmp_path):
    """XmlSuite.scala:367-388: custom/empty declaration framing."""
    books = read_xml(spark, f"{RES}/books-complicated.xml", rowTag="book")
    out1 = str(tmp_path / "no-decl")
    write_xml(
        books.repartition(1), out1, rowTag="book", rootTag="books", declaration=""
    )
    assert _part_lines(out1)[0] == "<books>"
    out2 = str(tmp_path / "default-decl")
    write_xml(books.repartition(1), out2, rowTag="book", rootTag="books")
    assert (
        _part_lines(out2)[0]
        == '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    )


def test_root_tag_with_attributes(spark, tmp_path):
    """XmlSuite.scala:1255-1268: rootTag may embed literal attributes."""
    df = spark.createDataFrame([(42, "foo")], "number int, value string").repartition(1)
    out = str(tmp_path / "attrs")
    write_xml(df, out, rootTag="root foo='bar' bing=\"baz\"", declaration="")
    assert _part_lines(out)[0] == "<root foo='bar' bing=\"baz\">"
    assert _part_lines(out)[-1] == "</root>"


def test_save_nested_array_item_name(spark, tmp_path):
    """XmlSuite.scala:390-395: nested arrays wrap items in arrayElementName."""
    df = spark.createDataFrame(
        [Row(thing=[[3, 4]])],
        T.StructType(
            [T.StructField("thing", T.ArrayType(T.ArrayType(T.IntegerType())))]
        ),
    ).repartition(1)
    out = str(tmp_path / "items")
    write_xml(df, out, arrayElementName="foo")
    text = "\n".join(_part_lines(out))
    assert text.count("<foo>") == 2


def test_save_null_value_empty_roundtrip(spark, tmp_path):
    """XmlSuite.scala:397-414: nullValue='' write + treatEmptyValuesAsNulls
    read round-trips."""
    books = read_xml(spark, f"{RES}/books-complicated.xml", rowTag="book")
    out = str(tmp_path / "nulls")
    write_xml(books, out, rowTag="book", rootTag="books", nullValue="")
    copy = read_xml(spark, out, rowTag="book", treatEmptyValuesAsNulls=True)
    assert copy.count() == books.count()
    assert {str(r) for r in copy.collect()} == {str(r) for r in books.collect()}


def test_save_custom_valuetag_prefix(spark, tmp_path):
    """XmlSuite.scala:416-441: valueTag starting with attributePrefix."""
    books = read_xml(
        spark,
        f"{RES}/books-attributes-in-no-child.xml",
        rowTag="book",
        valueTag="#VALUE",
        attributePrefix="#",
    )
    out = str(tmp_path / "vt")
    write_xml(
        books,
        out,
        rowTag="book",
        rootTag="catalog",
        valueTag="#VALUE",
        attributePrefix="#",
    )
    copy = read_xml(
        spark, out, rowTag="book", valueTag="#VALUE", attributePrefix="_"
    )
    assert copy.count() == books.count()
    assert {_vals(r) for r in copy.collect()} == {_vals(r) for r in books.collect()}


def test_save_nested_array_default_item_schema(spark, tmp_path):
    """XmlSuite.scala:443-462: array-of-array reads back wrapped in 'item'."""
    schema = T.StructType(
        [T.StructField("a", T.ArrayType(T.ArrayType(T.StringType())))]
    )
    df = spark.createDataFrame([Row(a=[["aa", "bb"], ["aa", "bb"]])], schema)
    out = str(tmp_path / "aa")
    write_xml(df, out)
    copy = read_xml(spark, out, rowTag="ROW")
    assert copy.count() == df.count()
    item_field = copy.schema["a"]
    assert isinstance(item_field.dataType, T.ArrayType)
    elem = item_field.dataType.elementType
    assert isinstance(elem, T.StructType)
    assert [f.name for f in elem.fields] == ["item"]


def test_save_all_data_types_roundtrip(spark, tmp_path):
    """XmlSuite.scala:464-504 analog: every writable type round-trips under
    an explicit schema."""
    import datetime
    import decimal

    schema = T.StructType(
        [
            T.StructField("c0", T.StringType()),
            T.StructField("c1", T.BooleanType()),
            T.StructField("c2", T.ByteType()),
            T.StructField("c3", T.ShortType()),
            T.StructField("c4", T.IntegerType()),
            T.StructField("c5", T.LongType()),
            T.StructField("c6", T.FloatType()),
            T.StructField("c7", T.DoubleType()),
            T.StructField("c8", T.DecimalType(25, 3)),
            T.StructField("c9", T.DateType()),
            T.StructField("c10", T.TimestampType()),
            T.StructField("c11", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    row = (
        "aa",
        True,
        8,
        88,
        8888,
        88888888,
        1.5,
        2.25,
        decimal.Decimal("12345.678"),
        datetime.date(2021, 2, 1),
        datetime.datetime(2021, 2, 1, 12, 30, 45),
        {"k1": "v1", "k2": "v2"},
    )
    df = spark.createDataFrame([row], schema)
    out = str(tmp_path / "typed")
    write_xml(df, out, rowTag="r")
    copy = read_xml(spark, out, schema=schema, rowTag="r")
    got = copy.first()
    exp = df.first()
    for f in schema.fields:
        assert got[f.name] == exp[f.name], f.name


def test_save_xz_deflate_codecs(spark, tmp_path):
    """Codec breadth beyond the reference's gzip test: xz (lzma) and
    deflate (Hadoop DefaultCodec zlib format) round-trip through the full
    write -> extension-sniffed read path."""
    cars = read_xml(spark, f"{RES}/cars.xml", rowTag="ROW")
    expect = {tuple(r) for r in cars.select(*sorted(cars.columns)).collect()}
    for codec, ext in (
        ("xz", ".xml.xz"),
        ("lzma", ".xml.xz"),
        ("deflate", ".xml.deflate"),
        ("org.apache.hadoop.io.compress.DefaultCodec", ".xml.deflate"),
    ):
        out = str(tmp_path / codec.rsplit(".", 1)[-1])
        write_xml(cars.repartition(1), out, rowTag="ROW", compression=codec)
        files = glob.glob(os.path.join(out, f"*{ext}"))
        assert files, f"no {ext} part file for codec {codec}"
        copy = read_xml(spark, out, rowTag="ROW")
        got = {tuple(r) for r in copy.select(*sorted(cars.columns)).collect()}
        assert got == expect, codec


def test_codec_spellings_unconditional():
    """Option validation accepts zstd/lz4/snappy spellings regardless of
    which backends this process can import (driver and executor envs must
    agree on the accepted set); a missing backend fails at USE time with
    an install hint, not at option-parse time."""
    from spark_xml_spark.xmlcore import codecs as C

    for spelling, canon in (
        ("zstd", "zstd"),
        ("ZStandardCodec", "zstd"),
        ("org.apache.hadoop.io.compress.SnappyCodec", "snappy"),
        ("snappy", "snappy"),
        ("lz4", "lz4"),
    ):
        assert C.normalize(spelling) == canon
    # sniffing is unconditional too
    assert C.compression_of("part-0.xml.zst") == "zstd"
    assert C.compression_of("part-0.xml.snappy") == "snappy"


def test_codec_missing_backend_use_time_error(monkeypatch):
    import io as _io

    import pytest

    from spark_xml_spark.xmlcore import codecs as C

    monkeypatch.setattr(C, "_zstd", None)
    with pytest.raises(ValueError, match="zstandard"):
        C.wrap_write(_io.BytesIO(), "zstd")
    with pytest.raises(ValueError, match="zstandard"):
        C.wrap_read(_io.BytesIO(), "zstd")


def test_hadoop_snappy_framing_roundtrip():
    """Hadoop BlockCompressorStream framing: multi-block payload (> one
    256 KiB block) round-trips, and the on-disk layout starts with the
    BE4 uncompressed block length Hadoop readers expect."""
    import io as _io
    import struct as _struct

    import pytest

    from spark_xml_spark.xmlcore import codecs as C

    try:
        C._snappy_backend()
    except ValueError:
        pytest.skip("no snappy backend in this env")
    payload = (b"<ROW><a>snappy snappy</a></ROW>\n" * 20000)  # ~640 KiB
    raw = _io.BytesIO()
    w = C.wrap_write(raw, "snappy")
    w.write(payload)
    w.close()
    data = raw.getvalue()
    (first_block_len,) = _struct.unpack(">I", data[:4])
    assert first_block_len == C._SNAPPY_BLOCK  # full first block
    raw.seek(0)
    assert C.wrap_read(raw, "snappy").read() == payload
    # chunked reads agree with the one-shot read
    raw.seek(0)
    r = C.wrap_read(raw, "snappy")
    chunks = []
    while True:
        c = r.read(12345)
        if not c:
            break
        chunks.append(c)
    assert b"".join(chunks) == payload


def test_deflate_bytes_are_zlib(spark, tmp_path):
    """.deflate output is a plain zlib stream (what Hadoop DefaultCodec
    writes), decodable without this library."""
    import zlib

    cars = read_xml(spark, f"{RES}/cars.xml", rowTag="ROW")
    out = str(tmp_path / "zl")
    write_xml(cars.repartition(1), out, rowTag="ROW", compression="deflate")
    f = glob.glob(os.path.join(out, "*.xml.deflate"))[0]
    with open(f, "rb") as fh:
        text = zlib.decompress(fh.read()).decode()
    assert text.lstrip().startswith("<?xml")
    assert text.count("<ROW>") == cars.count()


def test_save_zstd_lz4_codecs(spark, tmp_path):
    """Optional zstd/lz4 codecs (present on most clusters, gated behind
    import-try here) round-trip write -> extension-sniffed read; skipped
    where the backing modules are absent."""
    import pytest

    from spark_xml_spark.xmlcore import codecs as C

    available = [
        (codec, ext)
        for codec, ext in (
            ("zstd", ".xml.zst"),
            ("lz4", ".xml.lz4"),
            ("snappy", ".xml.snappy"),
        )
        if codec in C.WRITE_SUFFIX and _codec_importable(codec)
    ]
    if not available:
        pytest.skip("zstandard / lz4 / snappy backends not in this env")
    cars = read_xml(spark, f"{RES}/cars.xml", rowTag="ROW")
    expect = {tuple(r) for r in cars.select(*sorted(cars.columns)).collect()}
    for codec, ext in available:
        out = str(tmp_path / codec)
        write_xml(cars.repartition(1), out, rowTag="ROW", compression=codec)
        files = glob.glob(os.path.join(out, f"*{ext}"))
        assert files, f"no {ext} part file for codec {codec}"
        copy = read_xml(spark, out, rowTag="ROW")
        got = {tuple(r) for r in copy.select(*sorted(cars.columns)).collect()}
        assert got == expect, codec


def _codec_importable(codec: str) -> bool:
    if codec == "snappy":
        from spark_xml_spark.xmlcore import codecs as C

        try:
            C._snappy_backend()
            return True
        except ValueError:
            return False
    mod = {"zstd": "zstandard", "lz4": "lz4.frame"}[codec]
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


def test_optional_codec_missing_backend_fails_at_use_time(spark, tmp_path):
    """When a zstd/lz4/snappy backend is not importable the spelling still
    VALIDATES (the accepted-option set must not depend on this process's
    environment) and the write fails loudly with an install hint — never
    silently writing uncompressed bytes under a compressed extension."""
    import pytest

    cars = read_xml(spark, f"{RES}/cars.xml", rowTag="ROW")
    for codec, hint in (("zstd", "zstandard"), ("lz4", "lz4"),
                        ("snappy", "snappy")):
        if _codec_importable(codec):
            continue
        with pytest.raises(Exception, match=hint):
            write_xml(cars, str(tmp_path / f"bad_{codec}"), rowTag="ROW",
                      compression=codec)


def test_unknown_codec_rejected(spark, tmp_path):
    """Unsupported codecs fail loudly instead of writing uncompressed."""
    import pytest

    cars = read_xml(spark, f"{RES}/cars.xml", rowTag="ROW")
    with pytest.raises(Exception, match="[Uu]nsupported compression"):
        write_xml(cars, str(tmp_path / "bad"), rowTag="ROW", compression="brotli")


def test_indent_pretty_print_roundtrip(spark, tmp_path):
    """indent=true reproduces the reference's IndentingXMLStreamWriter
    layout (XmlFile.scala:86,108-109: 4-space step, text-only elements
    inline) and round-trips exactly."""
    books = read_xml(spark, f"{RES}/books-complicated.xml", rowTag="book")
    out = str(tmp_path / "pretty")
    write_xml(
        books.repartition(1), out, rowTag="book", rootTag="books", indent=True
    )
    lines = _part_lines(out)
    assert lines[1] == "<books>"
    assert lines[2].startswith("    <book")
    # nested children are deeper than row children
    assert any(l.startswith("        <") for l in lines)
    assert any(l.startswith("            <") for l in lines)
    copy = read_xml(spark, out, rowTag="book")
    assert {str(r) for r in copy.collect()} == {str(r) for r in books.collect()}


def test_indent_fast_and_generic_writers_agree(tmp_path):
    """The flat fast-path generator emits byte-identical indented output to
    the generic writer."""
    from pyspark.sql import types as T2

    from spark_xml_spark.options import XmlOptions
    from spark_xml_spark.xmlcore import generator

    schema = T2.StructType(
        [
            T2.StructField("id", T2.LongType()),
            T2.StructField("s", T2.StringType()),
            T2.StructField("d", T2.DoubleType()),
        ]
    )
    rows = [(1, "x", 1.5), (2, None, None), (None, None, None)]
    opts = XmlOptions.from_dict({"rowTag": "r", "indent": "true"})
    fast = generator.FastFlatGenerator.try_build(schema, opts)
    assert fast is not None
    for row in rows:
        assert fast.row_to_xml(row, "r") == generator.row_to_xml(
            schema, row, opts
        ), row
