"""SparkSession factory with package shipping.

``get_spark()`` builds a local or cluster session with the tuned defaults
this engine assumes (AQE, Arrow, UTC) and ships ``dads_spark`` itself to the
Python workers via ``addPyFile`` — the programmatic equivalent of
``spark-submit --py-files dads_spark.zip`` — so UDFs unpickle on executors
that don't share the driver's working directory.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PACKAGE_ROOT = os.path.dirname(os.path.abspath(__file__))


def package_zip(target_dir: str | None = None) -> str:
    """Zip the dads_spark package for --py-files / addPyFile shipping."""
    target_dir = target_dir or tempfile.gettempdir()
    zip_path = os.path.join(target_dir, "dads_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(_PACKAGE_ROOT):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join("dads_spark", os.path.relpath(full, _PACKAGE_ROOT))
                zf.write(full, rel)
    return zip_path


def get_spark(
    app_name: str = "dads_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32
    # one BLAS thread per Python worker: each task is already a parallel
    # unit; nested OpenBLAS/OMP threading (default = all cores PER worker)
    # oversubscribes the box catastrophically when many pandas-UDF workers
    # run concurrently, and is slower even for a single small-matrix task
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # local mode = driver-only JVM: the default 1g starves 32 concurrent
        # tasks of execution memory (this box has 125g)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added in this context, or read-only tmp
    return spark
