"""SparkSession construction with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every knob here is chosen for the
1000-executor / 100 TB case and merely *sized down* by environment
variables for the test harness:

- AQE on: runtime re-planning (skew joins, dynamic coalescing) is the
  main defence against skew at scale.
- ``spark.sql.shuffle.partitions`` defaults small locally; on a real
  cluster it should be ~2-3x total cores (AQE coalesces down anyway).
- Arrow enabled: every Python-boundary crossing in this engine is a
  vectorized pandas UDF; row-at-a-time Python UDFs are banned.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import SparkSession


def get_spark(app_name: str = "iceberg-geo-poc-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(int(cpus), 8)))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.files.maxPartitionBytes", "128MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4.x turns ANSI mode on by default, adding overflow checks
        # to every arithmetic expression (q1-style agg chains measured
        # +74% wall clock).  This engine's semantics were validated under
        # Spark 3.5 defaults (ANSI off) and its DuckDB oracles use
        # non-failing arithmetic, so pin the 3.5 behavior explicitly.
        .config("spark.sql.ansi.enabled", "false")
        # testdata events.ts is TIMESTAMP(NANOS) which Spark's reader rejects;
        # read as long and rescale in load_table (one footer inspection).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # INT96 timestamps carry no parquet min/max statistics, which
        # blinds manifest pruning on timestamp columns; micros are int64
        # with full stats (and the modern parquet representation)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # PySpark 4 captures the Python call site on EVERY DataFrame
        # API call to enrich error messages (pyspark.errors.utils
        # _with_origin: frame inspection + getActiveSession per call).
        # Pure driver-side overhead — measured as a visible slice of
        # per-iteration plan-build time on expression-heavy queries;
        # the documented off switch trades error-message context for
        # build speed (scale-independent: this never touches executors)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


_NANOS_COLS_CACHE: dict[str, tuple[str, ...]] = {}


def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as Parquet TIMESTAMP(NANOS) (driver-side footer read)."""
    if path not in _NANOS_COLS_CACHE:
        import os

        import pyarrow.parquet as pq
        import pyarrow.types as pat

        probe = path
        if os.path.isdir(path):
            # directory-style parquet (Spark writer layout): any one
            # part file carries the dataset schema.  Hive-partitioned
            # layouts have no top-level part file — recurse one level;
            # a dir with no parquet anywhere (e.g. only _SUCCESS) has
            # no nanos columns to report.
            probe = next(
                (
                    os.path.join(path, f)
                    for f in sorted(os.listdir(path))
                    if f.endswith(".parquet")
                ),
                None,
            )
            if probe is None:
                for sub in sorted(os.listdir(path)):
                    subdir = os.path.join(path, sub)
                    if not os.path.isdir(subdir):
                        continue
                    probe = next(
                        (
                            os.path.join(subdir, f)
                            for f in sorted(os.listdir(subdir))
                            if f.endswith(".parquet")
                        ),
                        None,
                    )
                    if probe is not None:
                        break
            if probe is None:
                _NANOS_COLS_CACHE[path] = ()
                return ()
        schema = pq.read_schema(probe)
        _NANOS_COLS_CACHE[path] = tuple(
            f.name
            for f in schema
            if pat.is_timestamp(f.type) and f.type.unit == "ns"
        )
    return _NANOS_COLS_CACHE[path]


def normalize_timestamps(df):
    """Cast every top-level TIMESTAMP_NTZ column to TIMESTAMP (LTZ).

    Spark 4.x infers parquet timestamps written without UTC adjustment
    as TIMESTAMP_NTZ (spark.sql.parquet.inferTimestampNTZ.enabled is on
    by default), and NTZ is rejected by ``withWatermark`` / event-time
    windows ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]).  With the session
    timezone pinned to UTC (get_spark), the cast re-interprets the naive
    values as UTC instants — byte-identical results to the Spark 3.5
    reads this engine was validated against.
    """
    from pyspark.sql.types import TimestampNTZType

    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


_SCHEMA_CACHE: dict[str, object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-generated testdata table (TESTDATA.md).

    TIMESTAMP(NANOS) columns (read as raw nanos longs under
    ``nanosAsLong``) are rescaled to micros timestamps JVM-side —
    integer division, no Python boundary, stays in codegen.

    The inferred schema is cached per path: testdata files are
    immutable, and parquet schema inference otherwise runs one Spark
    job (a driver-blocking footer read) on EVERY load_table call —
    measured as two 0.06-0.2 s single-task jobs plus scheduling gaps
    at the head of every benchmark iteration.
    """
    path = f"{sf_dir}/{name}.parquet"
    # The conf below is normally set by get_spark(), but the correctness
    # driver passes its own SparkSession; the conf is runtime-settable, so
    # set it here too — otherwise TIMESTAMP(NANOS) columns (events.ts)
    # fail the read outright with PARQUET_TYPE_ILLEGAL.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        schema = _SCHEMA_CACHE[path] = spark.read.parquet(path).schema
    df = spark.read.schema(schema).parquet(path)
    for c in _nanos_timestamp_cols(path):
        df = df.withColumn(c, F.expr(f"timestamp_micros(CAST(`{c}` div 1000 AS LONG))"))
    return normalize_timestamps(df)

