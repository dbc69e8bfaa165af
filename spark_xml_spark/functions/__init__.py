from spark_xml_spark.functions.flatten import flatten_xml
from spark_xml_spark.functions.xml_functions import (
    from_xml,
    from_xml_string,
    read_xml_strings,
    schema_of_xml,
    schema_of_xml_array,
    to_xml,
)

__all__ = [
    "flatten_xml",
    "from_xml",
    "from_xml_string",
    "read_xml_strings",
    "schema_of_xml",
    "schema_of_xml_array",
    "to_xml",
]
