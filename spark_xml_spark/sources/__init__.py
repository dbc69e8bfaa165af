from spark_xml_spark.sources.api import (
    infer_xml_schema,
    read_xml,
    register,
    write_xml,
)
from spark_xml_spark.sources.datasource import FORMAT_NAME, XmlDataSource

__all__ = [
    "FORMAT_NAME",
    "XmlDataSource",
    "infer_xml_schema",
    "read_xml",
    "register",
    "write_xml",
]
