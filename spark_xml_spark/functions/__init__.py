from spark_xml_spark.functions.xml_functions import (
    from_xml,
    from_xml_string,
    schema_of_xml,
    schema_of_xml_array,
    to_xml,
)

__all__ = [
    "from_xml",
    "from_xml_string",
    "schema_of_xml",
    "schema_of_xml_array",
    "to_xml",
]
