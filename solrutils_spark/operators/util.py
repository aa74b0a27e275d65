"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType, _parse_datatype_string


def _extend_schema(df: DataFrame, name: str, ddl_type: str) -> StructType:
    """df.schema + one column, WITHOUT mutating the DataFrame's cached schema
    (StructType.add mutates in place — extending df.schema directly corrupts
    the source DataFrame's column list)."""
    new_field = StructField(name, _parse_datatype_string(ddl_type))
    return StructType(list(df.schema.fields) + [new_field])
