"""Ingest: the reference CLI's ``tdb make`` re-expressed as Spark readers.

Reference surface (SURVEY §2.1 S5-S7): CSV with custom delimiter, header
row or positional ``--fields`` spec with column-index mapping
(``2:uuid,5:time``) (`tdbcli/op_make.c:166-236`, field spec `:91-117`);
newline-delimited JSON with required ``uuid``/``time`` keys and nulls
ignored (`tdbcli/op_make.c:262-372`); ``--skip-bad-input`` tolerance
(`tdbcli/op_make.c:153-163`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dataset import TrailDataset, normalize_events


def parse_field_spec(spec: list[str]) -> list[tuple[int | None, str]]:
    """``["uuid", "time", "2:action"]`` → [(None,'uuid'), (None,'time'),
    (2,'action')]; an explicit index pins the source column position
    (reference `tdbcli/op_make.c:91-117`, 1-based in the CLI)."""
    out: list[tuple[int | None, str]] = []
    for s in spec:
        if ":" in s:
            idx, name = s.split(":", 1)
            out.append((int(idx), name))
        else:
            out.append((None, s))
    return out


def make_from_csv(
    spark: SparkSession,
    path: str,
    fields: list[str] | None = None,
    delimiter: str = ",",
    header: bool = False,
    skip_bad_input: bool = True,
    uuid_col: str = "uuid",
    time_col: str = "time",
) -> TrailDataset:
    """Reference ``tdb make --csv`` (`tdbcli/op_make.c:166-236`).

    ``fields``: positional field spec when the file has no header; entries
    may carry a 1-based source index (``"3:uuid"``). ``skip_bad_input`` →
    DROPMALFORMED (reference `--skip-bad-input`), else FAILFAST.
    """
    mode = "DROPMALFORMED" if skip_bad_input else "FAILFAST"
    reader = (
        spark.read.option("delimiter", delimiter)
        .option("header", str(header).lower())
        .option("mode", mode)
    )
    df = reader.csv(path)

    def _src_col(idx: int, name: str) -> str:
        # the CLI spec is 1-based (reference tdbcli/op_make.c:91-117);
        # 0 or a negative index would silently wrap via Python indexing
        # and bind the WRONG source column
        if idx < 1 or idx > len(df.columns):
            raise ValueError(
                f"field spec {idx}:{name}: column index out of range "
                f"(1..{len(df.columns)}, 1-based)"
            )
        return df.columns[idx - 1]

    if not header:
        if not fields:
            # reference default (tdbcli/main.c usage): with no --fields,
            # two positional columns 'uuid' and 'time' are expected
            fields = ["uuid", "time"]
        spec = parse_field_spec(fields)
        sel = []
        for pos, (idx, name) in enumerate(spec):
            src = _src_col(idx, name) if idx is not None else f"_c{pos}"
            sel.append(F.col(src).alias(name))
        df = df.select(*sel)
    elif fields:
        # header present: spec subsets/renames by name or index
        spec = parse_field_spec(fields)
        sel = []
        for idx, name in spec:
            src = _src_col(idx, name) if idx is not None else name
            sel.append(F.col(src).alias(name))
        df = df.select(*sel)
    ev = _check_time(normalize_events(df, uuid_col, time_col), skip_bad_input)
    return TrailDataset(_check_uuid(ev, skip_bad_input))


def make_from_json(
    spark: SparkSession,
    path: str,
    fields: list[str] | None = None,
    skip_bad_input: bool = True,
    uuid_col: str = "uuid",
    time_col: str = "time",
) -> TrailDataset:
    """Reference ``tdb make --json`` (`tdbcli/op_make.c:262-372`):
    newline-delimited objects; ``uuid`` and ``time`` keys required; null
    values ignored (→ '' after normalization)."""
    mode = "DROPMALFORMED" if skip_bad_input else "FAILFAST"
    df = spark.read.option("mode", mode).json(path)
    if uuid_col not in df.columns or time_col not in df.columns:
        raise ValueError(f"JSON input must carry '{uuid_col}' and '{time_col}' keys")
    if fields:
        # a requested field absent from the input is a spec error, same
        # contract as dump.project_fields — silently dropping a
        # misspelled field would build a dataset missing data
        unknown = [f for f in fields if f not in df.columns]
        if unknown:
            raise ValueError(f"unknown fields in JSON input: {unknown}")
        keep = [uuid_col, time_col] + list(fields)
        df = df.select(*[c for c in df.columns if c in keep])
    ev = _check_time(normalize_events(df, uuid_col, time_col), skip_bad_input)
    return TrailDataset(_check_uuid(ev, skip_bad_input))


def _check_uuid(ev: DataFrame, skip_bad_input: bool) -> DataFrame:
    """The reference's uuid contract for `tdb make` (`tdbcli/op_make.c:22-38`
    parse_uuid + tdb_uuid_raw): a token is valid iff it is 1..32 hex
    chars; anything else skips the row (``--skip-bad-input``) or aborts.
    Documented deviation: the reference right-pads short tokens with '0'
    to 32 hex chars (an artifact of its 16-byte binary uuid storage);
    our string keys preserve the token verbatim — validation matches,
    canonical form doesn't need to. Library-level ``from_dataframe``
    deliberately accepts ARBITRARY string keys; only the CLI-parity
    ingest validates."""
    from ..dataset import UUID_COL

    ok = F.col(UUID_COL).rlike("^[0-9a-f]{1,32}$")
    if skip_bad_input:
        return ev.filter(ok)
    return ev.withColumn(
        UUID_COL,
        F.when(ok, F.col(UUID_COL)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("invalid uuid (want 1..32 hex chars; pass "
                          "skip_bad_input=True to drop): "),
                    F.col(UUID_COL),
                )
            ).cast("string")
        ),
    )


def _check_time(ev: DataFrame, skip_bad_input: bool) -> DataFrame:
    """The reference's bad-time contract (`tdbcli/op_make.c:153-163` +
    ``safely_to_int``): an unparseable time either skips the row
    (``--skip-bad-input``) or aborts the ingest — it must never land as a
    NULL-time event (which would sort first and corrupt time filters and
    info() bounds). ``normalize_events`` casts, so bad values surface here
    as NULLs."""
    from ..dataset import TIME_COL

    if skip_bad_input:
        return ev.filter(F.col(TIME_COL).isNotNull())
    # fail at evaluation time on the first bad row: raise_error sits in
    # the time column itself, so column pruning can never skip the check
    return ev.withColumn(
        TIME_COL,
        F.coalesce(
            F.col(TIME_COL),
            F.raise_error(
                F.lit("unparseable time value (pass skip_bad_input=True to drop)")
            ).cast("long"),
        ),
    )


def make_from_dataframe(df: DataFrame, uuid_col: str = "uuid", time_col: str = "time") -> TrailDataset:
    """Programmatic constructor (reference ``tdb_cons_add`` row sink,
    `src/tdb_cons.c:356-411` — in Spark the rows already exist as a
    DataFrame; finalize() is the encode step)."""
    return TrailDataset(normalize_events(df, uuid_col, time_col))
