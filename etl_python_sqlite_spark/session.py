"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` (one JVM); the configs below are chosen so
the same code is correct and fast on a multi-executor cluster:

* AQE on — runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast-join conversion replace hand-tuned partition counts.
* ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; on a
  real cluster you would raise it to ~2-3× total cores and let AQE coalesce.
* Arrow enabled for every pandas interchange (pandas UDFs, toPandas).
* Session timezone pinned to UTC — the reference stores ISO-8601 UTC
  timestamps (reference scr/etl_incremental_audit.py:213), and a pinned
  zone keeps parquet timestamp semantics identical across JVMs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: env var naming a sqlite-jdbc driver jar (e.g. xerial
#: sqlite-jdbc-*.jar). When set AND the file exists, the session builder
#: puts it on the driver/executor classpath so sources/sqlite.py's JDBC
#: path activates (distributed partitioned reads of the reference's own
#: storage engine). Absent in this offline environment — the probe is
#: how a user with the jar switches the bridge on without code changes.
SQLITE_JDBC_JAR_ENV = "SPARK_GRAFT_SQLITE_JDBC_JAR"


def _sqlite_jdbc_jar() -> str | None:
    jar = os.environ.get(SQLITE_JDBC_JAR_ENV)
    if jar and os.path.isfile(jar):
        return jar
    return None


def get_spark(
    app_name: str = "etl_python_sqlite_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    Any already-active session is reused (driver harnesses pass their own);
    configs here only apply when this call actually creates the session.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    # make google.protobuf importable (shim when absent) BEFORE the JVM
    # launches: the PYTHONPATH entry must be in the gateway's environment
    # for python workers to inherit it — transformWithStateInPandas's
    # state-server clients import it lazily worker-side (protoshim.py)
    from etl_python_sqlite_spark.protoshim import ensure_protobuf

    ensure_protobuf()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    jar = _sqlite_jdbc_jar()
    if jar:
        builder = builder.config("spark.jars", jar)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
