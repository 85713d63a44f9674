"""Fixed-width text source — the mainframe/legacy-feed format.

Plenty of enterprise queue feeds still arrive as fixed-width records
(COBOL copybook exports, bank/clearing files). There is no Spark
built-in; the idiomatic Spark-first reading is: ingest each line as
one string with ``spark.read.text`` (splittable, parallel by file
block), then slice columns with ``substring`` inside the scan
projection — whole-stage codegen, no Python, and column pruning
still works because unused slices are dropped by Catalyst before the
scan materializes them.

A field spec is (name, start, length, type) with 1-based ``start``
(copybook convention). Values are right-trimmed; all-blank fields
become NULL; numeric casts use try-semantics (malformed → NULL, so a
bad record never kills a 100-TB scan — route NULL-keyed rows to a
quarantine like sources/jsonl.py does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FieldSpec = tuple[str, int, int, str]


def fixedwidth_schema_projection(specs: list[FieldSpec]) -> list:
    cols = []
    for name, start, length, dtype in specs:
        raw = F.rtrim(F.substring(F.col("value"), start, length))
        col = F.when(raw != "", raw)
        if dtype != "string":
            # try_cast: malformed slices become NULL instead of
            # failing the whole scan (ANSI mode throws on cast)
            col = col.try_cast(dtype)
        cols.append(col.alias(name))
    return cols


def read_fixedwidth(
    spark: SparkSession, path: str, specs: list[FieldSpec]
) -> DataFrame:
    """Read a fixed-width file into typed columns per ``specs``."""
    return spark.read.text(path).select(
        *fixedwidth_schema_projection(specs)
    )


def write_fixedwidth(
    df: DataFrame, path: str, specs: list[FieldSpec]
) -> None:
    """Render columns to their fixed slots (left-justified, space
    padded, truncated at the field width — the copybook contract)
    and write as text."""
    line = F.concat(
        *[
            F.rpad(
                F.coalesce(F.col(name).cast("string"), F.lit("")),
                length,
                " ",
            ).substr(1, length)
            for name, _start, length, _dtype in specs
        ]
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)
