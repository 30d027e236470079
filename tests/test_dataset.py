"""TrailDataset round-trip + merge tests (FIXTURES F1 tiny, F5 merge_abc;
reference what_you_write_you_get_back.c, test_tdbcli.py merge suite)."""

import os

import pytest
from pyspark.sql import functions as F

from traildb_spark import EventFilter, TrailDataset
from traildb_spark.sources.dump import dump_csv, dump_json, project_fields


@pytest.fixture(scope="module")
def tiny(spark):
    # FIXTURES F1: 3 uuids × 3 events, username constant per trail
    actions = ["open", "save", "close"]
    rows = [
        (f"{i:032x}", i * 10 + j, f"user{i}", actions[j % 3])
        for i in range(3)
        for j in range(3)
    ]
    df = spark.createDataFrame(rows, ["uuid", "time", "username", "action"])
    return TrailDataset.from_dataframe(df)


def test_info(tiny):
    info = tiny.info()
    assert info.num_trails == 3
    assert info.num_events == 9
    assert info.min_timestamp == 0
    assert info.max_timestamp == 22
    assert info.fields == ["time", "username", "action"]


def test_lexicon(tiny):
    assert tiny.lexicon_size("action") == 4  # open,save,close + NULL
    assert tiny.lexicon_size("username") == 4
    vals = {r["value"] for r in tiny.lexicon("action").collect()}
    assert vals == {"open", "save", "close"}


def test_lexicon_dump(tiny):
    rows = tiny.lexicon_dump(["action"]).collect()
    got = {(r["field"], r["value"]): r["item_id"] for r in rows}
    # item 0 reserved for ''/NULL; real values dense-ranked by value order
    assert got == {
        ("action", ""): 0,
        ("action", "close"): 1,
        ("action", "open"): 2,
        ("action", "save"): 3,
    }
    # default: every non-time field
    both = tiny.lexicon_dump()
    assert {r["field"] for r in both.collect()} == {"action", "username"}


def test_roundtrip_finalize_open(tiny, spark, tmp_path):
    # "what you write is what you read" (reference
    # tests/c-tests/what_you_write_you_get_back.c)
    path = str(tmp_path / "tiny.tdb")
    tiny.finalize(path)
    back = TrailDataset.open(spark, path)
    a = sorted(map(tuple, tiny.df.collect()))
    b = sorted(map(tuple, back.df.collect()))
    assert a == b


def test_trail_access(tiny):
    t = tiny.trail(f"{1:032x}").collect()
    assert [r["time"] for r in t] == [10, 11, 12]
    assert all(r["username"] == "user1" for r in t)


def test_db_level_filter_view(tiny):
    view = tiny.with_filter(EventFilter().add_term("action", "open"))
    assert view.num_events() == 3
    assert view.num_trails() == 3


def test_null_normalization(spark):
    df = spark.createDataFrame([("U", 1, None), ("U", 2, "x")], ["uuid", "time", "f"])
    ds = TrailDataset.from_dataframe(df)
    vals = {r["f"] for r in ds.df.collect()}
    assert vals == {"", "x"}
    assert ds.df.filter(F.col("uuid") == "u").count() == 2  # lowercased


def test_timestamp_time_col(spark):
    import datetime

    df = spark.createDataFrame(
        [("u", datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc), "x")],
        ["uuid", "ts", "f"],
    )
    ds = TrailDataset.from_dataframe(df, time_col="ts")
    assert ds.df.first()["time"] == 1704067200


# --- merge suite (FIXTURES F5, reference test_tdbcli.py:186-332) ---------

def _mk(spark, cols, rows):
    from traildb_spark import normalize_events
    df = spark.createDataFrame(rows, cols)
    return TrailDataset(normalize_events(df))


@pytest.fixture(scope="module")
def merge_fixtures(spark):
    A = _mk(spark, ["uuid", "time", "alpha", "number"],
            [(f"{i:032x}", i + 100, chr(65 + i), str(i)) for i in range(10)])
    B = _mk(spark, ["uuid", "time", "number", "foobar"],
            [(f"{i:032x}", i + 100, str(i), str(i + 200)) for i in range(10)])
    C = _mk(spark, ["uuid", "time", "alpha", "number", "beta"],
            [(f"{i:032x}", i + 100, chr(65 + i), str(i), str(75 - i)) for i in range(10)])
    return A, B, C


def test_merge_duplicates_preserved(merge_fixtures):
    A, _, _ = merge_fixtures
    m = TrailDataset.merge([A, A])
    assert m.num_events() == 20  # UNION ALL: every event duplicated
    assert m.df.filter((F.col("uuid") == f"{0:032x}") & (F.col("alpha") == "A")).count() == 2


def test_merge_schema_union(merge_fixtures):
    A, B, _ = merge_fixtures
    m = TrailDataset.merge([A, B])
    assert set(m.df.columns) == {"uuid", "time", "alpha", "number", "foobar"}
    assert m.num_events() == 20
    # alpha/foobar mutually empty; sum(number)=2*45=90
    assert m.df.filter((F.col("alpha") == "") & (F.col("foobar") == "")).count() == 0
    assert m.df.filter(F.col("alpha") == "").count() == 10
    assert m.df.agg(F.sum(F.col("number").cast("long"))).first()[0] == 90


def test_merge_extra_field(merge_fixtures):
    A, _, C = merge_fixtures
    m = TrailDataset.merge([A, C])
    assert set(m.df.columns) == {"uuid", "time", "alpha", "number", "beta"}
    assert m.df.filter(F.col("beta") == "").count() == 10


def test_merge_with_whitelist(merge_fixtures):
    A, B, _ = merge_fixtures
    wl = [f"{i:032x}" for i in range(3)]
    m = TrailDataset.merge([A, B]).select_uuids(wl)
    assert m.num_events() == 6


def test_extract(merge_fixtures):
    A, _, _ = merge_fixtures
    ex = A.extract(EventFilter().add_term("number", "3"))
    assert ex.num_events() == 1


# --- dump sinks ----------------------------------------------------------

def test_dump_csv_json(tiny, spark, tmp_path):
    p1 = str(tmp_path / "out_csv")
    dump_csv(tiny.df, p1, fields=["uuid", "time", "action"], header=True)
    back = spark.read.option("header", "true").csv(p1)
    assert back.count() == 9
    assert back.columns == ["uuid", "time", "action"]

    p2 = str(tmp_path / "out_json")
    dump_json(tiny.df, p2, no_empty=True)
    back2 = spark.read.json(p2)
    assert back2.count() == 9


def test_project_unknown_field_errors(tiny):
    with pytest.raises(ValueError):
        project_fields(tiny.df, ["uuid", "nope"])


def test_field_name_validation(spark):
    """Reference rules (src/tdb_cons.c:181-223, tests/c-tests/field_names.c):
    charset, reserved 'time', duplicates, length."""
    from traildb_spark.dataset import normalize_events, validate_field_names

    validate_field_names(["ok_name", "Also-OK", "pct%25", "f9"])
    for bad in (["time"], ["has space"], ["dot.dot"], [""], ["x" * 512], ["a", "a"]):
        with pytest.raises(ValueError):
            validate_field_names(bad)

    # normalize_events applies the check to the field columns
    df = spark.createDataFrame([("u", 1, "v")], ["uuid", "time", "bad col"])
    with pytest.raises(ValueError):
        normalize_events(df)
    assert normalize_events(df, validate_names=False).columns == ["uuid", "time", "bad col"]


def test_zero_fields_and_empty_dataset(spark, tmp_path):
    """Reference edge cases tests/c-tests/zero_fields.c and
    empty_tdb_cons.c: a trail store with no value fields, and a finalized
    empty store, both round-trip."""
    from traildb_spark.dataset import normalize_events

    zf = normalize_events(spark.createDataFrame([("u1", 5), ("u1", 3), ("u2", 9)], ["uuid", "time"]))
    p = str(tmp_path / "zf")
    TrailDataset(zf).finalize(p)
    back = TrailDataset.open(spark, p)
    info = back.info()
    assert (info.num_trails, info.num_events) == (2, 3)
    assert (info.min_timestamp, info.max_timestamp) == (3, 9)

    empty = zf.limit(0)
    p2 = str(tmp_path / "empty")
    TrailDataset(empty).finalize(p2)
    back2 = TrailDataset.open(spark, p2)
    info2 = back2.info()
    assert (info2.num_trails, info2.num_events) == (0, 0)


def test_compression_codecs_identical_content(spark, tmp_path):
    """Reference runs every test under two compression configs
    (TDB_CONS_NO_BIGRAMS, tests/c-tests/tdb_test.h:9-33); our analog:
    the finalized layout must read back identically under different
    Parquet codecs."""
    from traildb_spark.dataset import normalize_events

    ev = normalize_events(
        spark.createDataFrame(
            [(f"u{i%7}", i, f"v{i%13}") for i in range(500)],
            ["uuid", "time", "f1"],
        )
    )
    hashes = []
    for codec in ("snappy", "zstd"):
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        p = str(tmp_path / codec)
        TrailDataset(ev).finalize(p)
        back = TrailDataset.open(spark, p).df
        h = back.agg(
            F.sum(F.crc32(F.concat_ws("|", "uuid", "time", "f1")))
        ).collect()[0][0]
        hashes.append((h, back.count()))
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
    assert hashes[0] == hashes[1]


def test_wide_schema_roundtrip(spark, tmp_path):
    """Reference stress: really_lots_of_fields.c (16382 fields max). 100
    fields round-trip with filter semantics intact."""
    from traildb_spark.dataset import normalize_events

    n_fields = 100
    cols = ["uuid", "time"] + [f"f{i}" for i in range(n_fields)]
    rows = [tuple(["u1", t] + [f"v{t}_{i}" for i in range(n_fields)]) for t in range(20)]
    df = normalize_events(spark.createDataFrame(rows, cols))
    p = str(tmp_path / "wide")
    TrailDataset(df).finalize(p)
    back = TrailDataset.open(spark, p)
    # fields includes the implicit 'time' (reference field 0, src/tdb.c:193)
    assert len(back.fields) == n_fields + 1
    f = EventFilter().new_clause().add_term("f99", "v7_99")
    got = back.with_filter(f).df.collect()
    assert len(got) == 1 and got[0]["time"] == 7


def test_shard_pruning_survives_session_timezone_change(spark, sf_dir, tmp_path):
    """Shard labels are pinned to UTC: a dataset finalized under one
    session timezone and queried under another must return identical
    rows (a tz-dependent label would prune away matching partitions)."""
    import pyspark.sql.functions as F

    from conftest import load_events
    from traildb_spark import EventFilter, TrailDataset

    ev = load_events(spark, sf_dir).select("uuid", "time", "event_type")
    path = str(tmp_path / "tz_sharded")
    TrailDataset(ev).finalize(path, num_buckets=2, time_shard="yyyy-MM-dd")
    t0, t1 = 1704067200, 1704153600
    f = EventFilter().add_time_range(t0, t1)
    expect = ev.filter((F.col("time") >= t0) & (F.col("time") < t1)).count()
    assert expect > 0
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        got = TrailDataset.open(spark, path).with_filter(f).df.count()
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert got == expect


def test_diff_datasets_detects_missing_and_matching(spark):
    from traildb_spark.dataset import diff_datasets

    a = spark.createDataFrame(
        [("u1", 1, "x"), ("u1", 2, "y"), ("u2", 5, "z"), ("u3", 7, "w")],
        ["uuid", "time", "f"],
    )
    b = spark.createDataFrame(
        [("u1", 1, "x"), ("u1", 2, "y"), ("u2", 5, "DIFFERENT")],
        ["uuid", "time", "f"],
    )
    got = {r["uuid"]: r for r in diff_datasets(a, b).collect()}
    assert got["u1"]["match"] is True
    assert got["u2"]["match"] is False  # same count, different content
    assert got["u2"]["n_a"] == got["u2"]["n_b"] == 1
    assert got["u3"]["match"] is False and got["u3"]["n_b"] == 0
    # duplicate events are NOT cancelled (additive digest, not XOR)
    a2 = spark.createDataFrame([("u", 1, "x"), ("u", 1, "x")], ["uuid", "time", "f"])
    b2 = spark.createDataFrame([("u", 1, "x")], ["uuid", "time", "f"])
    r = diff_datasets(a2, b2).first()
    assert r["match"] is False and r["n_a"] == 2


def test_diff_datasets_column_order_insensitive(spark):
    from traildb_spark.dataset import diff_datasets

    a = spark.createDataFrame([("u", 1, "x")], ["uuid", "time", "f"])
    b = spark.createDataFrame([("u", "x", 1)], ["uuid", "f", "time"])
    r = diff_datasets(a, b).first()
    assert r["match"] is True


def test_diff_datasets_separator_injection(spark):
    from traildb_spark.dataset import diff_datasets

    # ('x|y','z') vs ('x','y|z') concatenate identically under a bare
    # '|' join — the length-prefixed digest must tell them apart
    a = spark.createDataFrame([("u", "x|y", "z")], ["uuid", "f1", "f2"])
    b = spark.createDataFrame([("u", "x", "y|z")], ["uuid", "f1", "f2"])
    r = diff_datasets(a, b, fields=["f1", "f2"]).first()
    assert r["match"] is False


def test_lexicon_dump_zero_fields(spark):
    from traildb_spark.dataset import TrailDataset, normalize_events

    zf = normalize_events(spark.createDataFrame([("u", 5)], ["uuid", "time"]))
    out = TrailDataset(zf).lexicon_dump()
    assert out.columns == ["field", "value", "item_id"]
    assert out.count() == 0


def test_shard_predicate_sentinel_bounds(spark, tmp_path):
    from traildb_spark import EventFilter, TrailDataset
    from traildb_spark.dataset import normalize_events

    rows = [("u", 1704067200 + i * 86400, str(i)) for i in range(3)]
    ds = TrailDataset(
        normalize_events(spark.createDataFrame(rows, ["uuid", "time", "f"]))
    )
    p = str(tmp_path / "sh")
    ds.finalize(p, time_shard="yyyy-MM-dd")
    back = TrailDataset.open(spark, p)
    # sentinel end far beyond representable timestamps must not crash
    f = EventFilter().add_time_range(1704067200, 2**62)
    assert back.with_filter(f).df.count() == 3


def test_raw_binary_uuid_ingest_roundtrip(spark, tmp_path):
    """Raw 16-byte uuid columns (the reference's API form,
    src/tdb_uuid.c:52-75) normalize through the uuid_hex codec into the
    canonical lowercase-hex form: binary -> hex -> finalize -> open -> dump
    round-trips, and matches the same data ingested as hex text."""
    from traildb_spark.dataset import TrailDataset, normalize_events

    raw = bytes(range(16))                      # 000102...0e0f
    hex_form = raw.hex()
    rows_bin = [(bytearray(raw), 10, "x"), (bytearray(raw), 20, None)]
    df_bin = spark.createDataFrame(rows_bin, "uuid binary, time long, f string")
    ev = normalize_events(df_bin)
    got = sorted(map(tuple, ev.collect()))
    assert got == [(hex_form, 10, "x"), (hex_form, 20, "")]

    p = str(tmp_path / "bindb")
    TrailDataset(ev).finalize(p, num_buckets=1)
    back = TrailDataset.open(spark, p)
    assert back.trail(hex_form.upper()).count() == 2  # lookup normalizes too

    # identical to the hex-text ingest path
    df_hex = spark.createDataFrame(
        [(hex_form.upper(), 10, "x"), (hex_form, 20, None)],
        "uuid string, time long, f string",
    )
    assert sorted(map(tuple, normalize_events(df_hex).collect())) == got


def test_stale_index_guard_covers_sharded_datasets(spark, tmp_path):
    """The index<->data fingerprint must SEE the data of a time-sharded
    dataset (shard dirs start with '__shard=' — a naive hidden-dir walk
    would fingerprint them as empty and the stale guard would never
    fire)."""
    from traildb_spark.dataset import TrailDataset, _data_fingerprint

    rows = [("aa", 1704067200 + i * 86400, "x" if i % 2 else "y") for i in range(4)]
    from traildb_spark.dataset import normalize_events

    ds = TrailDataset(
        normalize_events(spark.createDataFrame(rows, ["uuid", "time", "f"]))
    )
    p = str(tmp_path / "sharded")
    ds.finalize(p, time_shard="yyyy-MM-dd")
    fp1 = _data_fingerprint(spark, p)
    assert fp1 != _data_fingerprint(spark, str(tmp_path))  # not the empty digest

    TrailDataset.build_index(spark, p, ["f"])
    assert TrailDataset.open(spark, p)._zindex is not None

    # rewrite the primary -> fingerprint changes -> index dropped
    ds2 = TrailDataset(
        normalize_events(
            spark.createDataFrame(rows[:2], ["uuid", "time", "f"])
        )
    )
    ds2.finalize(p, time_shard="yyyy-MM-dd", mode="overwrite")
    assert _data_fingerprint(spark, p) != fp1
    assert TrailDataset.open(spark, p)._zindex is None


def test_sidecar_and_index_discovery_on_qualified_paths(spark, tmp_path):
    """finalize → tdb-index → open over a ``file://``-QUALIFIED path:
    sidecar write/read, the data fingerprint walk, and z-index discovery
    all go through the Hadoop FS API, so the identical code path serves
    hdfs:// and s3a:// (an os.path-based walk would see no files behind
    the scheme prefix and silently skip discovery — perf loss at best,
    a never-firing stale guard at worst)."""
    from traildb_spark.dataset import TrailDataset, normalize_events

    rows = [
        (f"u{i % 3:02d}", 1704067200 + i * 86400, "x" if i % 2 else "y")
        for i in range(8)
    ]
    ds = TrailDataset(
        normalize_events(spark.createDataFrame(rows, ["uuid", "time", "f"]))
    )
    q = f"file://{tmp_path}/qualified_db"
    ds.finalize(q, time_shard="yyyy-MM-dd")

    opened = TrailDataset.open(spark, q)
    assert opened._shard_fmt == "yyyy-MM-dd"  # sidecar read through FS API

    TrailDataset.build_index(spark, q, ["f"])
    withx = TrailDataset.open(spark, q)
    assert withx._zindex is not None and withx._zindex[1] == ["f"]
    assert TrailDataset.open(spark, q, use_index=False)._zindex is None

    # rewrite the primary through the qualified path: stale guard fires
    ds.finalize(q, time_shard="yyyy-MM-dd", mode="overwrite")
    assert TrailDataset.open(spark, q)._zindex is None


def test_make_patch_apply_patch_roundtrip(spark):
    """apply_patch(a, make_patch(a, b)) must equal b as a MULTISET —
    including duplicate rows, pure deletions, pure insertions, and
    modified rows (delete+insert pairs); changed_only narrowing must not
    change the result; schema mismatch raises."""
    import pytest as _pytest

    from traildb_spark.dataset import apply_patch, diff_datasets, make_patch

    rows_a = [
        ("u1", 10, "x"), ("u1", 10, "x"),  # duplicate row: multiset matters
        ("u1", 20, "y"), ("u2", 5, "z"), ("u3", 7, "k"),
    ]
    rows_b = [
        ("u1", 10, "x"),                    # one duplicate removed
        ("u1", 20, "y2"),                   # modified
        ("u2", 5, "z"),                     # untouched trail
        ("u4", 9, "new"), ("u4", 9, "new"),  # inserted duplicates
    ]
    a = spark.createDataFrame(rows_a, "uuid string, time long, f string")
    b = spark.createDataFrame(rows_b, "uuid string, time long, f string")

    for changed_only in (True, False):
        patch = make_patch(a, b, changed_only=changed_only)
        got = sorted(map(tuple, apply_patch(a, patch).collect()))
        assert got == sorted(map(tuple, b.collect())), changed_only
        # the digest diff agrees: every trail matches after the patch
        d = diff_datasets(apply_patch(a, patch), b)
        assert d.filter(~d["match"]).count() == 0
    # untouched trails contribute NO patch rows under narrowing
    patch = make_patch(a, b)
    assert patch.filter(patch["uuid"] == "u2").count() == 0

    with _pytest.raises(ValueError, match="schemas differ"):
        make_patch(a, b.withColumnRenamed("f", "g"))


def test_fsutil_list_data_files_rules(spark, tmp_path):
    """The fingerprint walk's visibility rules, unit-level: hidden and
    metadata subtrees (_zindex, _staging, dotfiles) are invisible, Hive
    shard dirs ('__shard=...') are PRIMARY data, non-parquet files are
    ignored, and entries carry (rel, size, mtime)."""
    import os

    from traildb_spark import fsutil

    root = tmp_path / "db"
    (root / "__shard=2024-01-01").mkdir(parents=True)
    (root / "_zindex").mkdir()
    (root / "_staging" / "deep").mkdir(parents=True)
    (root / "__shard=2024-01-01" / "part-0.parquet").write_bytes(b"x" * 7)
    (root / "top.parquet").write_bytes(b"y" * 3)
    (root / "_zindex" / "z.parquet").write_bytes(b"z")
    (root / "_staging" / "deep" / "s.parquet").write_bytes(b"s")
    (root / ".hidden.parquet").write_bytes(b"h")
    (root / "_SUCCESS").write_bytes(b"")
    (root / "notes.txt").write_bytes(b"n")

    got = sorted(fsutil.list_data_files(spark, str(root)))
    assert [(r, s) for r, s, _ in got] == [
        ("__shard=2024-01-01/part-0.parquet", 7),
        ("top.parquet", 3),
    ]
    assert all(m > 0 for _, _, m in got)
    # qualified path: identical listing through the same API
    got_q = sorted(fsutil.list_data_files(spark, f"file://{root}"))
    assert [(r, s) for r, s, _ in got_q] == [(r, s) for r, s, _ in got]
    # absent root: empty, not an error
    assert list(fsutil.list_data_files(spark, str(tmp_path / "nope"))) == []


def test_make_patch_null_uuid_rows_not_lost(spark):
    """NULL-uuid rows must survive changed_only narrowing (NULL keys
    never pass a semi-join): differing NULL-uuid rows still produce
    patch rows and the round-trip still restores multiset equality."""
    from traildb_spark.dataset import apply_patch, make_patch

    a = spark.createDataFrame(
        [(None, 1, "x"), ("u1", 2, "y")],
        "uuid string, time long, f string",
    )
    b = spark.createDataFrame(
        [(None, 1, "CHANGED"), ("u1", 2, "y")],
        "uuid string, time long, f string",
    )
    patch = make_patch(a, b)
    assert patch.count() == 2  # one '-', one '+', both NULL-uuid
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    got = sorted(map(tuple, apply_patch(a, patch).collect()), key=key)
    assert got == sorted(map(tuple, b.collect()), key=key)


def test_diff_datasets_null_uuid_trail_compares_as_one(spark):
    """A NULL-uuid trail present identically on both sides must compare
    as ONE matching trail (null-safe join), not two spurious mismatches
    that would flip `tdb diff`'s exit status on identical datasets."""
    from traildb_spark.dataset import diff_datasets

    a = spark.createDataFrame(
        [(None, 1, "x"), ("u1", 2, "y")], "uuid string, time long, f string"
    )
    d = diff_datasets(a, a).collect()
    assert len(d) == 2 and all(r["match"] for r in d)
    b = spark.createDataFrame(
        [(None, 1, "DIFFERENT"), ("u1", 2, "y")],
        "uuid string, time long, f string",
    )
    d2 = {r["uuid"]: r["match"] for r in diff_datasets(a, b).collect()}
    assert d2 == {None: False, "u1": True}


def test_package_roundtrip_single_file(tiny, spark, tmp_path):
    """S3/S4 single-file ergonomics (reference src/tdb_cons_package.c):
    finalized dataset -> ONE .tdbx file -> extract -> identical rows,
    sidecar intact, z-index re-tied (no false-stale warning) and still
    routing. Manifest catches truncation and unmanifested extras."""
    import json as _json
    import tarfile
    import warnings

    from traildb_spark.dataset import (
        export_package, import_package, PACKAGE_MANIFEST,
    )

    src = str(tmp_path / "src")
    tiny.finalize(src)
    TrailDataset.build_index(spark, src, ["action"])

    pkg = str(tmp_path / "ds.tdbx")
    export_package(src, pkg)
    assert os.path.isfile(pkg)

    out = str(tmp_path / "back")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a stale-index warning = failure
        import_package(spark, pkg, out)
        back = TrailDataset.open(spark, out)
        assert back._zindex is not None  # index survived + re-tied
    a = sorted(map(tuple, tiny.df.collect()))
    b = sorted(map(tuple, back.df.collect()))
    assert a == b

    # CLI loop: dump --package / make --from-package
    from traildb_spark import cli

    pkg2 = str(tmp_path / "cli.tdbx")
    assert cli.main(["dump", "-i", src, "--package", pkg2]) == 0
    out2 = str(tmp_path / "cliback")
    assert cli.main(["make", "--from-package", pkg2, "-o", out2]) == 0
    assert sorted(map(tuple, TrailDataset.open(spark, out2).df.collect())) == a
    # incompatible-knob rejection
    assert cli.main(["dump", "-i", src, "--package", pkg2,
                     "--filter", "action=open"]) == 1
    assert cli.main(["make", "--from-package", pkg2, "--csv-header",
                     "-o", out2]) == 1

    # truncation refusal: rewrite one member short
    broken = str(tmp_path / "broken.tdbx")
    with tarfile.open(pkg) as t, tarfile.open(
        broken, "w", format=tarfile.USTAR_FORMAT
    ) as w:
        for m in t.getmembers():
            blob = t.extractfile(m).read()
            if m.name.endswith(".parquet"):
                blob = blob[: len(blob) // 2]
                m.size = len(blob)
            import io as _io
            w.addfile(m, _io.BytesIO(blob))
    with pytest.raises(ValueError, match="truncated"):
        import_package(spark, broken, str(tmp_path / "nope"))

    # non-package tar refusal
    not_pkg = str(tmp_path / "not.tdbx")
    with tarfile.open(not_pkg, "w") as w:
        ti = tarfile.TarInfo("x")
        ti.size = 1
        import io as _io
        w.addfile(ti, _io.BytesIO(b"a"))
    with pytest.raises(ValueError, match="manifest"):
        import_package(spark, not_pkg, str(tmp_path / "nope2"))
