"""Scalar helpers — the reference's full scalar-function surface (SURVEY
§2.7): uuid hex↔raw codecs (`src/tdb_uuid.c:52-75`), timestamp parsing
(`tdbcli/op_make.c:131-140`), byte-equality (built-in ``=``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uuid_hex(raw: Column) -> Column:
    """raw 16 bytes → 32-char lowercase hex (reference ``tdb_uuid_hex``,
    `src/tdb_uuid.c:62-75`)."""
    return F.lower(F.hex(raw))


def uuid_raw(hex_col: Column) -> Column:
    """32-char hex → 16 raw bytes (reference ``tdb_uuid_raw``,
    `src/tdb_uuid.c:52-60`)."""
    return F.unhex(hex_col)


def parse_time(col: Column) -> Column:
    """Text/number/timestamp → Unix-seconds LONG (reference
    ``safely_to_int`` on the time column, `tdbcli/main.c:20-28`)."""
    return (
        F.when(col.cast("long").isNotNull(), col.cast("long"))
        .otherwise(F.unix_timestamp(col.cast("timestamp")))
        .cast("long")
    )


def empty_as_null(col: Column) -> Column:
    return F.nullif(col, F.lit(""))


def null_as_empty(col: Column) -> Column:
    return F.coalesce(col.cast("string"), F.lit(""))
