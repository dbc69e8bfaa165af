"""XSD tooling tests: golden StructTypes ported from the reference's
XSDToSchemaSuite.scala:30-176 (root-element order adapted to document order
— see xsd.py module docstring) and validation behavior from
XmlSuite.scala:1090-1121."""

import pytest
from pyspark.sql import types as T

from spark_xml_spark.xsd import (
    XsdValidationError,
    get_validator,
    xsd_to_schema,
)

RES = "/root/reference/src/test/resources"


def field(name, dt=None, nullable=True):
    return T.StructField(name, dt or T.StringType(), nullable)


def struct(*fields):
    return T.StructType(list(fields))


def struct_array(name, *fields, nullable=True):
    return T.StructField(name, T.ArrayType(struct(*fields)), nullable)


def test_basket_basic():
    got = xsd_to_schema(f"{RES}/basket.xsd")
    expected = struct(
        field(
            "basket",
            struct(struct_array("entry", field("key"), field("value"))),
            nullable=False,
        )
    )
    assert got == expected


def test_include_relative_path():
    got = xsd_to_schema(f"{RES}/include-example/first.xsd")
    expected = struct(
        field(
            "basket",
            struct(struct_array("entry", field("key"), field("value"))),
            nullable=False,
        )
    )
    assert got == expected


def test_catalog_types_and_attributes():
    got = xsd_to_schema(f"{RES}/catalog.xsd")
    expected = struct(
        field(
            "catalog",
            struct(
                field(
                    "product",
                    struct(
                        struct_array(
                            "catalog_item",
                            field("item_number", nullable=False),
                            field("price", T.FloatType(), nullable=False),
                            struct_array(
                                "size",
                                struct_array(
                                    "color_swatch",
                                    field("_VALUE"),
                                    field("_image"),
                                ),
                                field("_description"),
                            ),
                            field("_gender"),
                        ),
                        field("_description"),
                        field("_product_image"),
                    ),
                    nullable=False,
                )
            ),
            nullable=False,
        )
    )
    assert got == expected


def test_choice_nullability():
    got = xsd_to_schema(f"{RES}/choice.xsd")
    expected = struct(
        field("el", struct(field("foo"), field("bar"), field("baz")), nullable=False)
    )
    assert got == expected


def test_two_root_elements():
    got = xsd_to_schema(f"{RES}/twoelements.xsd")
    # document order (reference asserts HashMap order bar, foo)
    assert {f.name for f in got.fields} == {"foo", "bar"}
    assert all(f.dataType == T.StringType() and not f.nullable for f in got.fields)


def test_xs_any():
    got = xsd_to_schema(f"{RES}/xsany.xsd")
    expected = struct(
        field(
            "root",
            struct(
                field("foo", struct(field("xs_any")), nullable=False),
                field("bar", struct(field("xs_any", nullable=False)), nullable=False),
                field(
                    "baz",
                    struct(
                        field("xs_any", T.ArrayType(T.StringType()), nullable=False)
                    ),
                    nullable=False,
                ),
                field("bing", struct(field("xs_any")), nullable=False),
            ),
            nullable=False,
        )
    )
    assert got == expected


def test_long_type():
    got = xsd_to_schema(f"{RES}/long.xsd")
    expected = struct(
        field(
            "test",
            struct(field("userId", T.LongType(), nullable=False)),
            nullable=False,
        )
    )
    assert got == expected


def test_decimal_with_restriction():
    got = xsd_to_schema(f"{RES}/decimal-with-restriction.xsd")
    by_name = {f.name: f for f in got.fields}
    assert by_name["decimal_type_1"].dataType == T.DecimalType(38, 18)
    assert by_name["decimal_type_2"].dataType == T.DecimalType(38, 2)
    assert by_name["decimal_type_3"].dataType == T.DecimalType(12, 6)
    assert all(not f.nullable for f in got.fields)


def test_ref_attribute():
    got = xsd_to_schema(f"{RES}/ref-attribute.xsd")
    book = struct(
        field("name", nullable=False),
        field("author", nullable=False),
        field("isbn", nullable=False),
    )
    expected = struct(
        field("book", book, nullable=False),
        field(
            "bookList",
            struct(
                T.StructField(
                    "book",
                    T.ArrayType(book),
                    True,
                )
            ),
            nullable=False,
        ),
    )
    assert got == expected


def test_complex_content_extension():
    got = xsd_to_schema(f"{RES}/complex-content-extension.xsd")
    expected = struct(
        field(
            "employee",
            struct(
                field("firstname", nullable=False),
                field("lastname", nullable=False),
                field("address", nullable=False),
                field("city", nullable=False),
                field("country", nullable=False),
            ),
            nullable=False,
        )
    )
    assert got == expected


def test_xsd_from_string():
    got = xsd_to_schema(
        """<?xml version="1.0"?>
        <xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:element name="r">
            <xs:complexType><xs:sequence>
              <xs:element name="a" type="xs:int"/>
              <xs:element name="b" type="xs:string" minOccurs="0"/>
            </xs:sequence></xs:complexType>
          </xs:element>
        </xs:schema>"""
    )
    expected = struct(
        field(
            "r",
            struct(
                field("a", T.IntegerType(), nullable=False),
                field("b", nullable=True),
            ),
            nullable=False,
        )
    )
    assert got == expected


# --- validation (ValidatorUtil + XmlSuite.scala:1090-1121) ----------------


def test_validator_accepts_valid_basket():
    v = get_validator(f"{RES}/basket.xsd")
    v(
        "<basket><entry><key>9027</key><value>glasstop stove</value></entry>"
        "<entry><key>288</key><value>wooden spoon</value></entry></basket>"
    )


def test_validator_rejects_undeclared_element():
    v = get_validator(f"{RES}/basket.xsd")
    with pytest.raises(XsdValidationError, match="undeclared element"):
        v(
            "<basket><entry><key>9027</key><value>x</value>"
            "<extra>123</extra></entry></basket>"
        )


def test_validator_lexical_types(tmp_path):
    xsd = tmp_path / "t.xsd"
    xsd.write_text(
        """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:element name="r">
            <xs:complexType><xs:sequence>
              <xs:element name="n" type="xs:long"/>
            </xs:sequence></xs:complexType>
          </xs:element>
        </xs:schema>"""
    )
    v = get_validator(str(xsd))
    v("<r><n>42</n></r>")
    with pytest.raises(XsdValidationError, match="not a valid xs:long"):
        v("<r><n>forty-two</n></r>")
    with pytest.raises(XsdValidationError, match="fewer than minOccurs"):
        v("<r></r>")


def test_validator_cache_and_missing():
    a = get_validator(f"{RES}/basket.xsd")
    b = get_validator(f"{RES}/basket.xsd")
    assert a is b
    with pytest.raises(FileNotFoundError):
        get_validator("/nonexistent/never.xsd")


# --- end-to-end through the reader (XmlSuite.scala:1090-1121) -------------


def test_read_with_xsd_validation(spark):
    from spark_xml_spark.sources.api import read_xml

    df = read_xml(
        spark,
        f"{RES}/basket.xml",
        rowTag="basket",
        rowValidationXSDPath=f"{RES}/basket.xsd",
    )
    assert df.selectExpr("entry[0].key").first()[0] == 9027

    df2 = read_xml(
        spark,
        f"{RES}/basket_invalid.xml",
        rowTag="basket",
        rowValidationXSDPath=f"{RES}/basket.xsd",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_malformed_records",
    )
    bad = df2.select("_malformed_records").first()[0]
    assert bad is not None and bad.startswith("<basket>")
