"""Export: the reference CLI's ``tdb dump`` re-expressed as Spark writers.

Reference surface (SURVEY §2.1 S8-S9, §2.2 P1): delimited text with
optional header (`tdbcli/op_dump.c:51-100`), one-JSON-object-per-event with
``--json-no-empty`` dropping empty values (`tdbcli/op_dump.c:69-90`), and
``--fields`` column projection/reorder (`tdbcli/op_dump.c:161-196`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_fields(df: DataFrame, fields: list[str] | None) -> DataFrame:
    """``--fields uuid,time,f2`` projection/reorder
    (`tdbcli/op_dump.c:161-196`). Column pruning reaches the Parquet scan
    (ReadSchema) — only requested columns are read."""
    if not fields:
        return df
    unknown = [f for f in fields if f not in df.columns]
    if unknown:
        raise ValueError(f"unknown fields: {unknown}")
    return df.select(*fields)


def dump_csv(
    df: DataFrame,
    path: str,
    fields: list[str] | None = None,
    delimiter: str = ",",
    header: bool = False,
    mode: str = "error",
) -> None:
    """Reference ``tdb dump --csv`` (`tdbcli/op_dump.c:51-67`)."""
    (
        project_fields(df, fields)
        .write.option("delimiter", delimiter)
        .option("header", str(header).lower())
        .option("emptyValue", "")
        .mode(mode)
        .csv(path)
    )


def dump_json(
    df: DataFrame,
    path: str,
    fields: list[str] | None = None,
    no_empty: bool = False,
    mode: str = "error",
) -> None:
    """Reference ``tdb dump --json`` (`tdbcli/op_dump.c:69-90`).

    ``no_empty`` replicates ``--json-no-empty``: empty-string values are
    nulled so Spark's JSON writer omits the key entirely.
    """
    out = project_fields(df, fields)
    if no_empty:
        for c, dtype in out.dtypes:
            if dtype == "string":
                out = out.withColumn(c, F.nullif(F.col(c), F.lit("")))
    out.write.mode(mode).json(path)
