"""Semi-structured (JSON) shredding: schema-on-read over string columns.

The reference's request documents are deeply nested BSON mutated with
dotted paths (queue/request_tools.py:157-158, 386-390); its data plane
never parses JSON at scale. A training-data pipeline does constantly —
crawl metadata, API event payloads, tool logs all arrive as JSON
strings beside the payload.

Scale design: ``from_json`` with an EXPLICIT schema is a single
JVM-side expression — no Python, no UDF, wholly inside codegen; the
parse runs inside the scan stage so only the projected fields survive
into downstream shuffles. Schema-less alternatives
(``get_json_object`` per field) re-parse the string once per field —
fine for one field, quadratic waste for many. ``shred_json`` therefore
parses ONCE into a struct and fans fields out of that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shred_json(
    df: DataFrame,
    json_col: str,
    schema: str,
    prefix: str = "",
    keep: bool = False,
) -> DataFrame:
    """Parse ``json_col`` with the DDL ``schema`` (e.g. ``"k LONG,
    tag STRING"``) and promote every top-level field to a column
    (optionally ``prefix``-ed). Malformed rows yield NULL fields
    (PERMISSIVE), never a task failure."""
    parsed = df.withColumn("__j", F.from_json(F.col(json_col), schema))
    field_names = parsed.schema["__j"].dataType.fieldNames()
    out = parsed.select(
        "*",
        *[
            F.col(f"__j.{name}").alias(f"{prefix}{name}")
            for name in field_names
        ],
    ).drop("__j")
    return out if keep else out.drop(json_col)
