"""Fixture-schema-drift guard.

Round 2's only real failure was environmental drift: the driver regenerated
``/root/testdata`` with ``events.ts`` as parquet TIMESTAMP(MICROS) where
round 1 had TIMESTAMP(NANOS), and ``load_table``'s hard-coded nanos
workaround silently shrank every timestamp 1000x (16 wrong queries, zero
test failures). This test is the class-fix: for every testdata table, the
values Spark reads through ``load_table`` must agree with the parquet
footer statistics that pyarrow reads natively. Any third encoding — or any
unit-mangling read path — fails loudly here instead of silently in
production queries.
"""

from __future__ import annotations

import datetime

import pyarrow.parquet as pq
import pyarrow.types as pat
import pytest

from go_nats_to_clickhouse_spark.schemas import TESTDATA_TABLES, load_table


def _footer_minmax(path: str) -> dict[str, tuple[object, object]]:
    """Per-column (min, max) from parquet row-group statistics, for timestamp
    and integer/floating columns that carry stats."""
    pf = pq.ParquetFile(path)
    schema = pf.schema_arrow
    out: dict[str, tuple[object, object]] = {}
    meta = pf.metadata
    for ci in range(meta.num_columns):
        col0 = meta.row_group(0).column(ci)
        name = col0.path_in_schema
        if "." in name:  # nested (e.g. embedding list) — no scalar stats
            continue
        field = schema.field(name)
        if not (
            pat.is_timestamp(field.type)
            or pat.is_integer(field.type)
            or pat.is_floating(field.type)
        ):
            continue
        mins, maxs = [], []
        for ri in range(meta.num_row_groups):
            st = meta.row_group(ri).column(ci).statistics
            if st is None or not st.has_min_max:
                mins, maxs = [], []
                break
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out[name] = (min(mins), max(maxs))
    return out


def _normalize(value):
    """Footer stats come back as python datetimes (tz-aware or naive) or
    numbers; Spark collect() gives naive datetimes in session tz (UTC).
    Compare on a common form, truncated to microseconds: Spark timestamps
    are micros-precision, so under a TIMESTAMP(NANOS) fixture with nonzero
    sub-microsecond components the intended nanos->micros truncation in
    load_table would otherwise trip this test's exact-equality assert (a
    false drift alarm — python datetime already holds only micros, but
    pyarrow nanos stats may arrive as integers)."""
    if isinstance(value, int) and abs(value) > 10**15:
        # raw nanos-since-epoch stat (pyarrow returns int when the logical
        # type isn't mapped): truncate to micros and lift to datetime
        value = datetime.datetime.fromtimestamp(
            (value // 1000) / 1e6, tz=datetime.timezone.utc
        )
    try:
        import pandas as pd

        if isinstance(value, pd.Timestamp):  # datetime subclass carrying nanos
            value = value.floor("us").to_pydatetime()
    except ImportError:
        pass
    if isinstance(value, datetime.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return value
    return value


@pytest.mark.parametrize("table", TESTDATA_TABLES)
def test_spark_read_agrees_with_parquet_footer(spark, sf_dir, table):
    path = f"{sf_dir}/{table}.parquet"
    footer = _footer_minmax(path)
    if not footer:
        pytest.skip(f"{table}: no scalar stats columns")
    df = load_table(spark, sf_dir, table)
    exprs = []
    for col in footer:
        exprs.append(f"min({col}) as min_{col}")
        exprs.append(f"max({col}) as max_{col}")
    row = df.selectExpr(*exprs).collect()[0].asDict()
    for col, (fmin, fmax) in footer.items():
        smin, smax = _normalize(row[f"min_{col}"]), _normalize(row[f"max_{col}"])
        fmin, fmax = _normalize(fmin), _normalize(fmax)
        assert smin == fmin, (
            f"{table}.{col}: Spark min {smin!r} != parquet footer min {fmin!r} "
            f"— fixture encoding drift or a broken read path in load_table"
        )
        assert smax == fmax, (
            f"{table}.{col}: Spark max {smax!r} != parquet footer max {fmax!r} "
            f"— fixture encoding drift or a broken read path in load_table"
        )


def test_events_ts_is_modern_not_epoch(spark, sf_dir):
    """Cheap smoke on the exact round-2 failure mode: a 1000x-shrunk
    timestamp axis lands in 1970. Whatever the encoding, event times must
    land in a plausible modern range."""
    df = load_table(spark, sf_dir, "events")
    lo, hi = df.selectExpr("min(ts)", "max(ts)").collect()[0]
    assert lo.year >= 2000, f"events.ts min {lo} is epoch-adjacent — unit bug"
    assert hi.year < 2100, f"events.ts max {hi} is implausibly far future"


def test_events_int96_legacy_encoding_reads_correctly(spark, sf_dir, tmp_path):
    """Third encoding, covered proactively: legacy INT96 timestamps (old
    Spark/Hive writers) surface in the ARROW schema as timestamp[ns] —
    indistinguishable from TIMESTAMP(NANOS) INT64, which load_table must
    read via nanosAsLong. Taking that path on INT96 explodes with
    SchemaColumnConvertNotSupportedException; the physical-type
    disambiguation in _timestamp_units must route INT96 to the native
    read and produce identical values to the micros original."""
    import glob
    import shutil

    src = load_table(spark, sf_dir, "events")
    d = tmp_path / "int96"
    d.mkdir()
    orig = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        src.coalesce(1).write.mode("overwrite").parquet(str(d / "_tmp"))
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", orig)
    part = glob.glob(str(d / "_tmp" / "part-*.parquet"))[0]
    shutil.move(part, str(d / "events.parquet"))

    from go_nats_to_clickhouse_spark.schemas import _timestamp_units

    assert _timestamp_units(str(d / "events.parquet"))["ts"] == "int96"
    got = load_table(spark, str(d), "events")
    assert got.schema == src.schema
    a = sorted(
        (r.event_id, r.ts) for r in got.select("event_id", "ts").collect()
    )
    b = sorted(
        (r.event_id, r.ts) for r in src.select("event_id", "ts").collect()
    )
    assert a == b
