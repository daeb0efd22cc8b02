"""Schema-explicit file scans: CSV / JSON-lines / Parquet, batch + stream.

The reference delegates all storage to ClickHouse tables; our engine's
scan layer is Spark's native file sources (SURVEY.md §2.7 "Scans").
The rules encoded here are the ones that matter at 100 TB:

* **Explicit schema, always.** Schema inference is a full extra pass
  over the data before the real job starts — `read_files` refuses to
  scan without a schema for text formats (parquet carries its own).
* **Pushdown must reach the scan.** CSV/JSON/Parquet readers all
  support filter + column pushdown; `scan_report` surfaces the
  `PushedFilters` / `ReadSchema` lines from the formatted plan so tests
  (and humans) can assert a filter actually pruned I/O instead of
  trusting it did.
* **Streams are the same scans.** Every format here has a readStream
  twin with `maxFilesPerTrigger` for admission control — the
  batch/streaming unification the reference cannot do (its ingest path
  is NATS-only, main.go:60-108).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_TEXT_FORMATS = {"csv", "json"}
_FORMATS = _TEXT_FORMATS | {"parquet"}


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Batch scan of ``path`` as ``fmt`` (csv | json | parquet).

    CSV defaults: header on. JSON means JSON-lines (one object per
    line) — multiline JSON kills input splitting, so it is opt-in via
    ``multiLine=true``.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (want one of {sorted(_FORMATS)})")
    if fmt in _TEXT_FORMATS and schema is None:
        raise ValueError(
            f"{fmt} scans require an explicit schema: inference is a full "
            "extra pass over the input before the job starts"
        )
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def stream_files(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | str,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Streaming twin of :func:`read_files` — new files under ``path``
    become micro-batches. ``max_files_per_trigger`` is the admission
    control knob (the analog of the reference's 1000-message batch cap).
    Streams always need the schema, parquet included."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (want one of {sorted(_FORMATS)})")
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def scan_report(df: DataFrame) -> dict[str, str]:
    """Extract scan-efficiency facts from the formatted physical plan:
    ``PushedFilters`` (did the predicate reach the reader?) and
    ``ReadSchema`` (did column pruning reach the reader?). Empty strings
    when the plan has no file scan."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):  # explain() prints; there is no
        df.explain("formatted")  # public string API across Spark versions
    plan = buf.getvalue()
    report = {"pushed_filters": "", "read_schema": ""}
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            report["pushed_filters"] = s.removeprefix("PushedFilters:").strip()
        elif s.startswith("ReadSchema:"):
            report["read_schema"] = s.removeprefix("ReadSchema:").strip()
    return report
