"""SparkSession factory with the configuration the pipeline assumes.

Scale posture: AQE on (runtime coalescing + skew-join splitting for the
Zipf-domain pages table), Arrow for all pandas interchange, and a
shuffle-partition count sized by the caller (tests use small values;
bench uses the core count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "log-parser-spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    # make the repo importable in python WORKERS regardless of how the
    # driver was launched (workers don't inherit the driver's sys.path;
    # with SPARK_HOME set they boot from $SPARK_HOME/python)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # zstd for every parquet write (guide §6): measured faster to
        # WRITE than snappy for the records artifact (interleaved A/B:
        # 5.2/5.1/4.8 s vs 6.2/5.6/5.3 s) and ~30% smaller (17.3 vs
        # 24.8 MB), which also shrinks every sink's records re-scan
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # unix domain sockets for the JVM<->python worker channel:
        # measured 1.6x faster records-output at 32 cores than TCP
        # loopback (kernel syscall contention in this sandbox)
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # Stop the session cleanly at interpreter exit: otherwise the JVM
    # dies under the python daemon's workers mid-flush and they spam
    # BrokenPipeError tracebacks to stderr.  Residual one-line worker
    # EPIPEs can still appear with the unix-domain-socket channel (idle
    # pooled daemon workers notice the closed socket); they are emitted
    # by child processes after our code is done and are harmless — the
    # UDS channel stays on because it measures 1.6x faster at 32 cores.
    import atexit

    def _stop(ref=spark):
        try:
            ref.stop()
        except Exception:
            pass
    atexit.register(_stop)
    return spark


_PYFILES_SENT: set[str] = set()


def build_pyfiles_zip(zip_path: str | None = None) -> str:
    """Zip the package for worker-side import (sc.addPyFile).  Members:
    code AND the vendored data tree — addPyFile zips sit AHEAD of
    PYTHONPATH on worker sys.path, so this zip shadows the on-disk
    package for every worker import; a py-only zip silently breaks any
    worker-side datafiles.data_dir() call (zip-resource extraction
    finds no data/ member).  Same member filter as
    tools/make_pyfiles.py (pinned by tests/test_packaging.py)."""
    import zipfile

    if zip_path is None:
        zip_path = os.path.join(
            os.environ.get("TMPDIR", "/tmp"), "log_parser_spark_pyfiles.zip")
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_root = os.path.join(pkg_root, "data")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_root):
            for f in files:
                full = os.path.join(root, f)
                if f.endswith(".py") or full.startswith(
                        data_root + os.sep):
                    rel = os.path.join(
                        "log_parser_spark",
                        os.path.relpath(full, pkg_root))
                    z.write(full, rel)
    return zip_path


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Make the log_parser_spark package importable in python workers of
    an EXTERNALLY-created SparkSession (e.g. the verification driver's):
    zip the package and sc.addPyFile it once per session.  Sessions built
    by get_spark don't need this (PYTHONPATH is set pre-JVM), but
    addPyFile is harmless there.

    Keyed by applicationId, not id(spark): CPython can reuse a stopped
    session's id for a new one, which would silently skip addPyFile."""
    key = spark.sparkContext.applicationId
    if key in _PYFILES_SENT:
        return
    zip_path = build_pyfiles_zip()
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already registered in this context
    _PYFILES_SENT.add(key)
