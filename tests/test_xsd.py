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


_FACET_XSD = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="item">
    <xs:complexType><xs:sequence>
      <xs:element name="code">
        <xs:simpleType>
          <xs:restriction base="xs:string">
            <xs:pattern value="[A-Z]{2}-\\d{3}"/>
          </xs:restriction>
        </xs:simpleType>
      </xs:element>
      <xs:element name="grade">
        <xs:simpleType>
          <xs:restriction base="xs:string">
            <xs:enumeration value="A"/>
            <xs:enumeration value="B"/>
            <xs:enumeration value="C"/>
          </xs:restriction>
        </xs:simpleType>
      </xs:element>
      <xs:element name="qty">
        <xs:simpleType>
          <xs:restriction base="xs:int">
            <xs:minInclusive value="1"/>
            <xs:maxInclusive value="99"/>
          </xs:restriction>
        </xs:simpleType>
      </xs:element>
      <xs:element name="tag" minOccurs="0">
        <xs:simpleType>
          <xs:restriction base="xs:string">
            <xs:minLength value="2"/>
            <xs:maxLength value="5"/>
          </xs:restriction>
        </xs:simpleType>
      </xs:element>
    </xs:sequence></xs:complexType>
  </xs:element>
</xs:schema>"""


def _facet_validator(tmp_path):
    p = tmp_path / "facets.xsd"
    p.write_text(_FACET_XSD)
    return get_validator(str(p))


def test_validator_facets(tmp_path):
    v = _facet_validator(tmp_path)
    v("<item><code>AB-123</code><grade>B</grade><qty>5</qty><tag>abc</tag></item>")
    with pytest.raises(XsdValidationError, match="pattern"):
        v("<item><code>ab-123</code><grade>B</grade><qty>5</qty></item>")
    with pytest.raises(XsdValidationError, match="enumeration"):
        v("<item><code>AB-123</code><grade>F</grade><qty>5</qty></item>")
    with pytest.raises(XsdValidationError, match="maxInclusive"):
        v("<item><code>AB-123</code><grade>A</grade><qty>100</qty></item>")
    with pytest.raises(XsdValidationError, match="length"):
        v("<item><code>AB-123</code><grade>A</grade><qty>9</qty><tag>x</tag></item>")


def test_validator_namespaced_instance(tmp_path):
    # '{uri}local' instance tags must match local-name declarations
    p = tmp_path / "ns.xsd"
    p.write_text("""<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="thing">
    <xs:complexType><xs:sequence>
      <xs:element name="name" type="xs:string"/>
    </xs:sequence></xs:complexType>
  </xs:element>
</xs:schema>""")
    v = get_validator(str(p))
    v('<thing xmlns="http://example.com/ns"><name>ok</name></thing>')


def test_facet_violation_lands_in_corrupt_record(spark, tmp_path):
    """PERMISSIVE read with row validation: facet-violating rows keep the
    raw record in _corrupt_record, valid rows parse (the reference's
    basket-invalid shape, XmlSuite.scala:1090-1121)."""
    from pyspark.sql import functions as F

    from spark_xml_spark.sources.api import read_xml

    xsd = tmp_path / "facets.xsd"
    xsd.write_text(_FACET_XSD)
    data = tmp_path / "items"
    data.mkdir()
    (data / "a.xml").write_text(
        "<items>"
        "<item><code>AB-123</code><grade>A</grade><qty>5</qty></item>"
        "<item><code>bad</code><grade>A</grade><qty>5</qty></item>"
        "<item><code>CD-456</code><grade>Z</grade><qty>5</qty></item>"
        "</items>"
    )
    schema = T.StructType(
        [
            T.StructField("code", T.StringType()),
            T.StructField("grade", T.StringType()),
            T.StructField("qty", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = read_xml(
        spark,
        str(data),
        schema=schema,
        rowTag="item",
        rowValidationXSDPath=str(xsd),
        mode="PERMISSIVE",
    )
    rows = df.collect()
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    good = [r for r in rows if r["_corrupt_record"] is None]
    assert len(rows) == 3 and len(corrupt) == 2 and len(good) == 1
    assert good[0]["code"] == "AB-123"


def test_pattern_union_semantics(tmp_path):
    """Multiple xs:pattern facets in ONE restriction step are a UNION per
    the spec: a value passes when ANY pattern matches."""
    p = tmp_path / "pat.xsd"
    p.write_text("""<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="v">
    <xs:simpleType>
      <xs:restriction base="xs:string">
        <xs:pattern value="[A-Z]{2}"/>
        <xs:pattern value="[0-9]{3}"/>
      </xs:restriction>
    </xs:simpleType>
  </xs:element>
</xs:schema>""")
    v = get_validator(str(p))
    v("<v>AB</v>")     # matches pattern 1
    v("<v>123</v>")    # matches pattern 2
    with pytest.raises(XsdValidationError, match="pattern"):
        v("<v>ab</v>")  # matches neither


def test_whitespace_collapse_facet(tmp_path):
    p = tmp_path / "ws.xsd"
    p.write_text("""<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="v">
    <xs:simpleType>
      <xs:restriction base="xs:string">
        <xs:whiteSpace value="collapse"/>
        <xs:maxLength value="5"/>
      </xs:restriction>
    </xs:simpleType>
  </xs:element>
</xs:schema>""")
    v = get_validator(str(p))
    v("<v>  ab   cd  </v>")  # collapses to 'ab cd' (5 chars): passes
    with pytest.raises(XsdValidationError, match="length"):
        v("<v>  ab   cde  </v>")  # 'ab cde' is 6 chars


def test_sequence_order_enforced(tmp_path):
    p = tmp_path / "seq.xsd"
    p.write_text("""<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="r">
    <xs:complexType><xs:sequence>
      <xs:element name="a" type="xs:string"/>
      <xs:element name="b" type="xs:string"/>
    </xs:sequence></xs:complexType>
  </xs:element>
</xs:schema>""")
    v = get_validator(str(p))
    v("<r><a>1</a><b>2</b></r>")
    with pytest.raises(XsdValidationError, match="sequence order"):
        v("<r><b>2</b><a>1</a></r>")


def test_choice_order_not_enforced(tmp_path):
    p = tmp_path / "ch.xsd"
    p.write_text("""<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="r">
    <xs:complexType><xs:choice maxOccurs="unbounded">
      <xs:element name="a" type="xs:string"/>
      <xs:element name="b" type="xs:string"/>
    </xs:choice></xs:complexType>
  </xs:element>
</xs:schema>""")
    v = get_validator(str(p))
    v("<r><b>2</b><a>1</a></r>")  # any order inside a choice


_IDENTITY_XSD = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="order">
    <xs:complexType><xs:sequence>
      <xs:element name="product" minOccurs="0" maxOccurs="unbounded">
        <xs:complexType>
          <xs:attribute name="sku" type="xs:string" use="required"/>
        </xs:complexType>
      </xs:element>
      <xs:element name="line" minOccurs="0" maxOccurs="unbounded">
        <xs:complexType>
          <xs:attribute name="ref" type="xs:string" use="required"/>
        </xs:complexType>
      </xs:element>
    </xs:sequence></xs:complexType>
    <xs:key name="productKey">
      <xs:selector xpath="product"/>
      <xs:field xpath="@sku"/>
    </xs:key>
    <xs:keyref name="lineRef" refer="productKey">
      <xs:selector xpath="line"/>
      <xs:field xpath="@ref"/>
    </xs:keyref>
  </xs:element>
</xs:schema>"""


def test_identity_key_uniqueness(tmp_path):
    p = tmp_path / "key.xsd"
    p.write_text(_IDENTITY_XSD)
    v = get_validator(str(p))
    v('<order><product sku="A"/><product sku="B"/><line ref="A"/></order>')
    with pytest.raises(XsdValidationError, match="duplicate"):
        v('<order><product sku="A"/><product sku="A"/></order>')


def test_identity_keyref_resolution(tmp_path):
    p = tmp_path / "keyref.xsd"
    p.write_text(_IDENTITY_XSD)
    v = get_validator(str(p))
    with pytest.raises(XsdValidationError, match="keyref"):
        v('<order><product sku="A"/><line ref="MISSING"/></order>')


def test_identity_unique_with_element_field(tmp_path):
    p = tmp_path / "uniq.xsd"
    p.write_text("""<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="catalog">
    <xs:complexType><xs:sequence>
      <xs:element name="item" minOccurs="0" maxOccurs="unbounded">
        <xs:complexType><xs:sequence>
          <xs:element name="name" type="xs:string" minOccurs="0"/>
        </xs:sequence></xs:complexType>
      </xs:element>
    </xs:sequence></xs:complexType>
    <xs:unique name="itemName">
      <xs:selector xpath=".//item"/>
      <xs:field xpath="name"/>
    </xs:unique>
  </xs:element>
</xs:schema>""")
    v = get_validator(str(p))
    v("<catalog><item><name>x</name></item><item><name>y</name></item></catalog>")
    # absent fields are ignored by xs:unique
    v("<catalog><item/><item/></catalog>")
    with pytest.raises(XsdValidationError, match="unique"):
        v("<catalog><item><name>x</name></item><item><name>x</name></item></catalog>")


def test_nillable_elements(tmp_path):
    """xsi:nil='true' is valid only on elements declared nillable, must
    have no content, and skips the content-model check (javax.xml
    parity); nillable also forces nullable in xsd_to_schema."""
    p = tmp_path / "nil.xsd"
    p.write_text("""<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="rec">
    <xs:complexType><xs:sequence>
      <xs:element name="qty" type="xs:long" nillable="true"/>
      <xs:element name="name" type="xs:string"/>
    </xs:sequence></xs:complexType>
  </xs:element>
</xs:schema>""")
    v = get_validator(str(p))
    xsi = 'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"'
    v(f'<rec {xsi}><qty xsi:nil="true"/><name>a</name></rec>')
    v("<rec><qty>5</qty><name>a</name></rec>")
    # nil with content
    with pytest.raises(XsdValidationError, match="no content"):
        v(f'<rec {xsi}><qty xsi:nil="true">5</qty><name>a</name></rec>')
    # nil on a non-nillable element
    with pytest.raises(XsdValidationError, match="not declared nillable"):
        v(f'<rec {xsi}><qty>1</qty><name xsi:nil="true"/></rec>')
    # malformed nil value
    with pytest.raises(XsdValidationError, match="xsi:nil"):
        v(f'<rec {xsi}><qty xsi:nil="maybe"/><name>a</name></rec>')
    # lexical check still applies when not nil
    with pytest.raises(XsdValidationError, match="xs:long"):
        v("<rec><qty>five</qty><name>a</name></rec>")
    schema = xsd_to_schema(str(p))
    rec = schema["rec"].dataType
    assert rec["qty"].nullable is True  # nillable despite minOccurs=1
    assert rec["name"].nullable is False


_SUBST_XSD = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="vehicle" abstract="true" type="xs:string"/>
  <xs:element name="car" substitutionGroup="vehicle" type="xs:string"/>
  <xs:element name="ev" substitutionGroup="car" type="xs:string"/>
  <xs:element name="fleet">
    <xs:complexType><xs:sequence>
      <xs:element ref="vehicle" minOccurs="1" maxOccurs="2"/>
      <xs:element name="depot" type="xs:string"/>
    </xs:sequence></xs:complexType>
  </xs:element>
</xs:schema>"""


def test_substitution_groups(tmp_path):
    """A particle referencing a head element admits substitution-group
    members (transitively); members count against the head's occurrence
    bounds and sequence position; an abstract head cannot appear itself."""
    p = tmp_path / "subst.xsd"
    p.write_text(_SUBST_XSD)
    v = get_validator(str(p))
    v("<fleet><car>a</car><depot>d</depot></fleet>")
    v("<fleet><ev>e</ev><car>a</car><depot>d</depot></fleet>")  # transitive
    # abstract head used directly
    with pytest.raises(XsdValidationError, match="abstract"):
        v("<fleet><vehicle>x</vehicle><depot>d</depot></fleet>")
    # occurrence bounds pool across members (maxOccurs=2)
    with pytest.raises(XsdValidationError, match="maxOccurs"):
        v("<fleet><car>a</car><ev>b</ev><car>c</car><depot>d</depot></fleet>")
    # minOccurs=1 still enforced when no member appears
    with pytest.raises(XsdValidationError, match="minOccurs|fewer"):
        v("<fleet><depot>d</depot></fleet>")
    # members obey the head's sequence position
    with pytest.raises(XsdValidationError, match="order"):
        v("<fleet><depot>d</depot><car>a</car></fleet>")
    # a member still validates against its own type
    with pytest.raises(XsdValidationError, match="undeclared"):
        v("<fleet><truck>a</truck><depot>d</depot></fleet>")
    # abstract global root rejected
    with pytest.raises(XsdValidationError, match="abstract"):
        v("<vehicle>x</vehicle>")
    # substitution member as document root is a global element: valid
    v("<car>x</car>")


_REDEFINE_BASE = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:simpleType name="SKU">
    <xs:restriction base="xs:string">
      <xs:pattern value="[A-Z]{2}-[0-9]+"/>
    </xs:restriction>
  </xs:simpleType>
  <xs:complexType name="ItemType">
    <xs:sequence>
      <xs:element name="sku" type="SKU"/>
      <xs:element name="qty" type="xs:int"/>
    </xs:sequence>
  </xs:complexType>
</xs:schema>"""

_REDEFINE_MAIN = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:redefine schemaLocation="base.xsd">
    <xs:simpleType name="SKU">
      <xs:restriction base="SKU">
        <xs:maxLength value="6"/>
      </xs:restriction>
    </xs:simpleType>
  </xs:redefine>
  <xs:element name="item" type="ItemType"/>
</xs:schema>"""


def test_redefine_restriction_chain(tmp_path):
    """xs:redefine replaces the named type; the self-referential
    restriction base means the ORIGINAL type, and facets of EVERY layer
    of the resulting chain apply (pattern from the base schema AND the
    redefined maxLength)."""
    (tmp_path / "base.xsd").write_text(_REDEFINE_BASE)
    p = tmp_path / "main.xsd"
    p.write_text(_REDEFINE_MAIN)
    v = get_validator(str(p))
    v("<item><sku>AB-123</sku><qty>5</qty></item>")
    # original pattern facet still applies through the redefine
    with pytest.raises(XsdValidationError, match="pattern"):
        v("<item><sku>ab-123</sku><qty>5</qty></item>")
    # redefined maxLength applies on top of it
    with pytest.raises(XsdValidationError, match="length"):
        v("<item><sku>AB-12345</sku><qty>5</qty></item>")
    # untouched types from the redefined document keep working
    with pytest.raises(XsdValidationError, match="int"):
        v("<item><sku>AB-123</sku><qty>x</qty></item>")


def test_redefine_schema_conversion(tmp_path):
    (tmp_path / "base.xsd").write_text(_REDEFINE_BASE)
    p = tmp_path / "main.xsd"
    p.write_text(_REDEFINE_MAIN)
    got = xsd_to_schema(str(p))
    expected = struct(
        field(
            "item",
            struct(
                field("sku", T.StringType(), nullable=False),
                field("qty", T.IntegerType(), nullable=False),
            ),
            nullable=False,
        )
    )
    assert got == expected


def test_restriction_of_named_restriction_without_redefine(tmp_path):
    """A named simpleType restricting another named simpleType chains
    facets even outside xs:redefine."""
    p = tmp_path / "chain.xsd"
    p.write_text(
        """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:simpleType name="Code">
    <xs:restriction base="xs:string"><xs:pattern value="[A-Z]+"/></xs:restriction>
  </xs:simpleType>
  <xs:simpleType name="ShortCode">
    <xs:restriction base="Code"><xs:maxLength value="3"/></xs:restriction>
  </xs:simpleType>
  <xs:element name="c" type="ShortCode"/>
</xs:schema>"""
    )
    v = get_validator(str(p))
    v("<c>ABC</c>")
    with pytest.raises(XsdValidationError, match="pattern"):
        v("<c>abc</c>")
    with pytest.raises(XsdValidationError, match="length"):
        v("<c>ABCD</c>")


def test_union_and_list_simple_types(tmp_path):
    """xs:union validates when ANY member accepts the value; xs:list
    validates each whitespace-separated item against the item type."""
    p = tmp_path / "ul.xsd"
    p.write_text(
        """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:simpleType name="Size">
    <xs:restriction base="xs:string">
      <xs:enumeration value="S"/><xs:enumeration value="M"/><xs:enumeration value="L"/>
    </xs:restriction>
  </xs:simpleType>
  <xs:simpleType name="SizeOrNum">
    <xs:union memberTypes="Size xs:int"/>
  </xs:simpleType>
  <xs:simpleType name="IntList">
    <xs:list itemType="xs:int"/>
  </xs:simpleType>
  <xs:element name="row">
    <xs:complexType><xs:sequence>
      <xs:element name="size" type="SizeOrNum"/>
      <xs:element name="nums" type="IntList" minOccurs="0"/>
    </xs:sequence></xs:complexType>
  </xs:element>
</xs:schema>"""
    )
    v = get_validator(str(p))
    v("<row><size>M</size><nums>1 2 3</nums></row>")
    v("<row><size>42</size></row>")            # second union member
    v("<row><size>M</size><nums></nums></row>")  # empty list is valid
    with pytest.raises(XsdValidationError, match="union"):
        v("<row><size>XL</size></row>")        # neither enum nor int
    with pytest.raises(XsdValidationError, match="int"):
        v("<row><size>M</size><nums>1 two 3</nums></row>")


def test_attribute_values_and_undeclared(tmp_path):
    """Attribute VALUES are validated against their declared simple types
    (lexical + facets), undeclared attributes are rejected unless
    xs:anyAttribute is present, and use=prohibited is honored."""
    p = tmp_path / "attrs.xsd"
    p.write_text(
        """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="item">
    <xs:complexType>
      <xs:sequence><xs:element name="v" type="xs:string" minOccurs="0"/></xs:sequence>
      <xs:attribute name="n" type="xs:int" use="required"/>
      <xs:attribute name="grade">
        <xs:simpleType><xs:restriction base="xs:string">
          <xs:enumeration value="A"/><xs:enumeration value="B"/>
        </xs:restriction></xs:simpleType>
      </xs:attribute>
      <xs:attribute name="old" use="prohibited"/>
    </xs:complexType>
  </xs:element>
  <xs:element name="open">
    <xs:complexType>
      <xs:anyAttribute/>
    </xs:complexType>
  </xs:element>
</xs:schema>"""
    )
    v = get_validator(str(p))
    v('<item n="5" grade="A"><v>x</v></item>')
    v('<item n="-3"/>')
    with pytest.raises(XsdValidationError, match="int"):
        v('<item n="five"/>')
    with pytest.raises(XsdValidationError, match="enumeration"):
        v('<item n="1" grade="F"/>')
    with pytest.raises(XsdValidationError, match="undeclared attribute"):
        v('<item n="1" zz="9"/>')
    with pytest.raises(XsdValidationError, match="prohibited"):
        v('<item n="1" old="y"/>')
    with pytest.raises(XsdValidationError, match="required"):
        v("<item/>")
    v('<open a="1" b="2"/>')  # anyAttribute admits unknowns


def test_attribute_group_expansion(tmp_path):
    """Named xs:attributeGroup references expand into the declared set:
    members validate by type, and attributes outside the group are still
    rejected."""
    p = tmp_path / "ag.xsd"
    p.write_text(
        """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:attributeGroup name="dims">
    <xs:attribute name="w" type="xs:int" use="required"/>
    <xs:attribute name="h" type="xs:int"/>
  </xs:attributeGroup>
  <xs:element name="box">
    <xs:complexType>
      <xs:attributeGroup ref="dims"/>
      <xs:attribute name="label" type="xs:string"/>
    </xs:complexType>
  </xs:element>
</xs:schema>"""
    )
    v = get_validator(str(p))
    v('<box w="3" h="4" label="a"/>')
    v('<box w="3"/>')
    with pytest.raises(XsdValidationError, match="int"):
        v('<box w="wide"/>')
    with pytest.raises(XsdValidationError, match="required"):
        v('<box h="4"/>')
    with pytest.raises(XsdValidationError, match="undeclared"):
        v('<box w="1" zz="2"/>')


def test_attribute_ref_to_global_declaration(tmp_path):
    """Regression: xs:attribute ref= to a global declaration must resolve
    (typed, use= overridable at the reference site), not reject the
    attribute as undeclared."""
    p = tmp_path / "refattr.xsd"
    p.write_text(
        """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:attribute name="lang" type="xs:string"/>
  <xs:attribute name="n" type="xs:int"/>
  <xs:element name="doc">
    <xs:complexType>
      <xs:sequence><xs:element name="v" type="xs:string"/></xs:sequence>
      <xs:attribute ref="lang"/>
      <xs:attribute ref="n" use="required"/>
    </xs:complexType>
  </xs:element>
</xs:schema>"""
    )
    v = get_validator(str(p))
    v('<doc lang="en" n="1"><v>x</v></doc>')
    v('<doc n="2"><v>x</v></doc>')
    with pytest.raises(XsdValidationError, match="required"):
        v('<doc lang="en"><v>x</v></doc>')
    with pytest.raises(XsdValidationError, match="int"):
        v('<doc n="x"><v>x</v></doc>')
    with pytest.raises(XsdValidationError, match="undeclared"):
        v('<doc n="1" zz="1"><v>x</v></doc>')


# --- facet value-space matrix (VERDICT r6 task 7) ---------------------------
# Each case documents the javax.xml.validation (Xerces) behavior it
# reproduces: value-space (not lexical/float) comparison for ranges and
# enumerations, octet lengths for binary types, value-space totalDigits
# (leading/trailing zeros insignificant per the XSD errata, as Xerces
# implements), per-type whiteSpace defaults, item-count lengths for list
# restrictions.


def _facet_schema(body: str) -> str:
    return (
        '<?xml version="1.0"?>\n'
        '<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">\n'
        '<xs:element name="root"><xs:complexType><xs:sequence>\n'
        f"{body}\n"
        "</xs:sequence></xs:complexType></xs:element>\n"
        "</xs:schema>\n"
    )


def _el(name: str, base: str, facets: str) -> str:
    return (
        f'<xs:element name="{name}"><xs:simpleType>'
        f'<xs:restriction base="xs:{base}">{facets}</xs:restriction>'
        "</xs:simpleType></xs:element>"
    )


def _accepts(validate, xml: str) -> bool:
    try:
        validate(xml)
        return True
    except XsdValidationError:
        return False


FACET_MATRIX = [
    # (base, facets, value, valid, javax/Xerces behavior note)
    # -- decimal-exact ranges: float compare would collapse 2^53 neighbours
    ("long", '<xs:minInclusive value="9007199254740993"/>',
     "9007199254740992", False, "compares in decimal value space"),
    ("long", '<xs:minInclusive value="9007199254740993"/>',
     "9007199254740993", True, "boundary value accepted"),
    ("decimal", '<xs:maxExclusive value="10.00"/>', "10", False,
     "10 == 10.00 in value space -> excluded"),
    ("decimal", '<xs:maxInclusive value="10.00"/>', "10", True,
     "10 == 10.00 in value space -> included"),
    # -- float/double special lexicals
    ("double", '<xs:minInclusive value="0"/>', "INF", True,
     "INF is in double's value space and > 0"),
    ("double", '<xs:maxInclusive value="0"/>', "-INF", True, "-INF <= 0"),
    # -- datetime: timezone spellings normalize before comparison
    ("dateTime", '<xs:minInclusive value="2024-01-01T00:00:00Z"/>',
     "2024-01-01T01:00:00+02:00", False,
     "23:00Z of the prior day < midnight Z despite larger lexical"),
    ("dateTime", '<xs:minInclusive value="2024-01-01T00:00:00Z"/>',
     "2024-01-01T01:00:00+00:00", True, "+00:00 == Z"),
    ("date", '<xs:maxInclusive value="2024-06-30"/>', "2024-06-30", True,
     "date boundary"),
    ("date", '<xs:maxInclusive value="2024-06-30"/>', "2024-07-01", False,
     "date beyond max"),
    ("time", '<xs:minInclusive value="09:00:00"/>', "08:59:59", False,
     "time below min"),
    # -- binary lengths count OCTETS
    ("hexBinary", '<xs:length value="2"/>', "0FB7", True,
     "4 hex chars = 2 octets"),
    ("hexBinary", '<xs:length value="2"/>', "0FB7AA", False, "3 octets"),
    ("base64Binary", '<xs:length value="3"/>', "QUJD", True,
     "QUJD decodes to 3 bytes ('ABC')"),
    ("base64Binary", '<xs:length value="2"/>', "QUJD", False,
     "3 bytes != 2"),
    # -- totalDigits/fractionDigits per errata (Xerces value-space):
    #    leading/trailing zeros insignificant
    ("decimal", '<xs:totalDigits value="2"/>', "007", True,
     "leading zeros insignificant: 007 has 1 significant digit"),
    ("decimal", '<xs:totalDigits value="2"/>', "123", False,
     "3 significant digits > 2"),
    ("decimal", '<xs:totalDigits value="2"/>', "1.10", True,
     "1.1 normalized: 2 digits"),
    ("decimal", '<xs:fractionDigits value="1"/>', "1.10", True,
     "trailing zero insignificant in fraction"),
    ("decimal", '<xs:fractionDigits value="1"/>', "1.12", False,
     "2 significant fraction digits"),
    # -- whiteSpace defaults: token collapses, string preserves
    ("token", '<xs:length value="3"/>', "  a b  ", True,
     "token collapses to 'a b' (3 chars) before length"),
    ("token", '<xs:length value="7"/>', "  a b  ", False,
     "collapsed length is 3, not the raw 7"),
    ("string", '<xs:length value="7"/>', "  a b  ", True,
     "string preserves whitespace: length 7"),
    # -- value-space enumerations on numerics
    ("int", '<xs:enumeration value="1"/><xs:enumeration value="2"/>',
     "01", True, "01 == 1 in value space"),
    ("int", '<xs:enumeration value="1"/><xs:enumeration value="2"/>',
     "3", False, "not a member"),
    # -- pattern union within one step
    ("string", '<xs:pattern value="[a-z]+"/><xs:pattern value="[0-9]+"/>',
     "abc", True, "patterns in one step are a union"),
    ("string", '<xs:pattern value="[a-z]+"/><xs:pattern value="[0-9]+"/>',
     "abc1", False, "matches neither branch"),
    # -- review r7: totalDigits trailing INTEGER zeros are significant
    ("decimal", '<xs:totalDigits value="2"/>', "100", False,
     "Xerces: 100 has 3 digits (integer trailing zeros significant)"),
    ("decimal", '<xs:totalDigits value="3"/>', "100", True, "3 digits ok"),
    ("decimal", '<xs:totalDigits value="2"/>', "0.05", True,
     "leading fraction zeros count but int part is empty: 2 digits"),
    ("decimal", '<xs:totalDigits value="1"/>', "0.05", False,
     "0.05 has 2 digits"),
    # -- review r7: NaN is equal to itself in XSD value space
    ("double", '<xs:enumeration value="NaN"/><xs:enumeration value="1.0"/>',
     "NaN", True, "NaN equals NaN in XSD value space"),
    ("double", '<xs:enumeration value="NaN"/>', "2.0", False,
     "2.0 not in the enumeration"),
    # -- review r7c: duration value-space ordering (month-length bounds;
    #    indeterminate comparisons violate the facet, as in Xerces)
    ("duration", '<xs:minInclusive value="P1Y"/>', "P13M", True,
     "13 months >= 12 months (pure year-month order)"),
    ("duration", '<xs:minInclusive value="P1Y"/>', "P11M", False,
     "11 months < 12 months"),
    ("duration", '<xs:maxInclusive value="PT1H"/>', "PT59M", True,
     "day-time order: 59min <= 1h"),
    ("duration", '<xs:maxInclusive value="PT1H"/>', "P1D", False,
     "1 day > 1 hour determinately"),
    ("duration", '<xs:minInclusive value="P1M"/>', "P32D", True,
     "32 days > any month length (28-31d): determinate"),
    ("duration", '<xs:minInclusive value="P1M"/>', "P30D", False,
     "30 days vs 1 month is INDETERMINATE -> facet violation"),
    # -- review r7c: character-class subtraction translated to lookahead
    ("string", '<xs:pattern value="[a-z-[aeiou]]+"/>', "bcdfg", True,
     "class subtraction: consonants only"),
    ("string", '<xs:pattern value="[a-z-[aeiou]]+"/>', "bca", False,
     "contains a vowel"),
    # -- advice r7: subtraction must rewrite BEFORE \i/\c substitution —
    #    the canonical NCName idiom [\i-[:]][\c-[:]]* compiled into wrong
    #    semantics (valid names falsely malformed) when \i was expanded
    #    first, and the lenient re.error path never fired
    ("string", r'<xs:pattern value="[\i-[:]][\c-[:]]*"/>', "a", True,
     "NCName: single name-start char (the advice's failing case)"),
    ("string", r'<xs:pattern value="[\i-[:]][\c-[:]]*"/>', "ab-c.d_e", True,
     "NCName: name chars minus colon"),
    ("string", r'<xs:pattern value="[\i-[:]][\c-[:]]*"/>', "a:b", False,
     "NCName: colon excluded by subtraction"),
    ("string", r'<xs:pattern value="[\i-[:]][\c-[:]]*"/>', "1ab", False,
     "NCName: digit is not a name-start char"),
    ("string", r'<xs:pattern value="\i\c*"/>', "a:b", True,
     "bare \\i/\\c (no subtraction) still substitute"),
    # -- advice r7: '-P'/'-PT' are invalid duration lexicals (the sign is
    #    LEADING, so the old rstrip guard let them parse as zero)
    ("duration", '<xs:maxInclusive value="P1Y"/>', "-P", False,
     "Xerces rejects '-P' as an invalid lexical form"),
    ("duration", '<xs:maxInclusive value="P1Y"/>', "-PT", False,
     "Xerces rejects '-PT' as an invalid lexical form"),
    ("duration", '<xs:maxInclusive value="P1Y"/>', "-P1D", True,
     "negative durations themselves remain valid lexicals"),
    ("duration", '<xs:maxInclusive value="P1Y"/>', "P1DT", False,
     "trailing T with no time components is an invalid lexical"),
    # -- r8: zoned gYear*/gMonth*/gDay range facets in VALUE SPACE (the
    #    last documented out-of-scope item): representative-moment order,
    #    mixed zoned/naive under the spec's +/-14:00 window
    ("gYear", '<xs:minInclusive value="2020"/>', "2024", True,
     "plain year order"),
    ("gYear", '<xs:minInclusive value="2020"/>', "2019", False,
     "below the minimum"),
    ("gYear", '<xs:minInclusive value="2020Z"/>', "2020+14:00", False,
     "2020+14:00 begins 14h BEFORE 2020Z -> minExclusive window"),
    ("gYear", '<xs:minInclusive value="2020Z"/>', "2021-14:00", True,
     "zoned both sides: instants compare totally"),
    ("gYear", '<xs:minInclusive value="2020Z"/>', "2021", True,
     "naive 2021 is >14h after 2020Z at any offset: determinate"),
    ("gYear", '<xs:minInclusive value="2020Z"/>', "2020", False,
     "naive 2020 vs 2020Z is within the 14h window: INDETERMINATE"),
    ("gYearMonth", '<xs:maxInclusive value="2024-06"/>', "2024-06", True,
     "boundary month"),
    ("gYearMonth", '<xs:maxInclusive value="2024-06"/>', "2024-07", False,
     "month beyond max"),
    ("gMonth", '<xs:minInclusive value="--03"/>', "--11", True,
     "gMonth orders in the reference year"),
    ("gMonth", '<xs:minInclusive value="--03"/>', "--02", False,
     "February < March"),
    ("gMonthDay", '<xs:maxInclusive value="--06-15"/>', "--02-29", True,
     "leap-day lexical is valid (reference year 1972 is a leap year)"),
    ("gDay", '<xs:minExclusive value="---10"/>', "---11", True,
     "gDay orders on the day number"),
    ("gDay", '<xs:minExclusive value="---10"/>', "---10", False,
     "exclusive boundary"),
]


@pytest.mark.parametrize(
    "base,facets,value,valid,note",
    [m[:5] for m in FACET_MATRIX],
    ids=[f"{m[0]}-{i}" for i, m in enumerate(FACET_MATRIX)],
)
def test_facet_value_space_matrix(tmp_path, base, facets, value, valid, note):
    from spark_xml_spark.xsd import get_validator

    xsd = tmp_path / f"f_{base}.xsd"
    xsd.write_text(_facet_schema(_el("v", base, facets)))
    validate = get_validator(str(xsd))
    ok = _accepts(validate, f"<root><v>{value}</v></root>")
    assert ok is valid, f"{base} {facets} {value!r}: {note}"


def test_list_restriction_counts_items(tmp_path):
    """A restriction whose base is a LIST type applies length facets to
    ITEM COUNTS (javax), not characters, and validates each item against
    the item type."""
    from spark_xml_spark.xsd import get_validator

    xsd = tmp_path / "list.xsd"
    xsd.write_text(
        '<?xml version="1.0"?>\n'
        '<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">\n'
        '<xs:simpleType name="ints">'
        '<xs:list itemType="xs:int"/></xs:simpleType>\n'
        '<xs:simpleType name="threeInts">'
        '<xs:restriction base="ints"><xs:length value="3"/>'
        "</xs:restriction></xs:simpleType>\n"
        '<xs:element name="root"><xs:complexType><xs:sequence>'
        '<xs:element name="v" type="threeInts"/>'
        "</xs:sequence></xs:complexType></xs:element>\n"
        "</xs:schema>\n"
    )
    validate = get_validator(str(xsd))
    assert _accepts(validate, "<root><v>1 2 3</v></root>")
    assert not _accepts(validate, "<root><v>1 2</v></root>")
    assert not _accepts(validate, "<root><v>1 2 3 4</v></root>")
    assert not _accepts(validate, "<root><v>1 x 3</v></root>")
