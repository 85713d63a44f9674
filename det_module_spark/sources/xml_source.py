"""XML source/sink — Spark 4's built-in StAX XML data source.

The reference's document tooling is file-format plumbing
(SURVEY §2.1 S6/K1-K4 cover CSV/JSON/PDF/zip); XML rounds out the
interchange formats a queue-style engine meets in the wild (feeds,
exports, config payloads). Spark 4 ships the former spark-xml
package as a first-class format — no jars to deploy — so this
wrapper only pins the conventions (rowTag, schema-stable column
order) and documents them for parity with the rest of sources/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", root_tag: str = "rows"
) -> None:
    """One XML document per partition file; stable element order =
    the DataFrame's column order."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode("overwrite")
        .save(path)
    )


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row"
) -> DataFrame:
    """Schema-inferred XML read (pass .schema(...) upstream for
    production stability; inference scans the files once)."""
    return spark.read.format("xml").option("rowTag", row_tag).load(path)
