"""Ship this package to Python workers (sc.addPyFile) on demand.

The driver contract imports the engine via a sys.path patch
(__spark_entry__.py), but Spark's Python WORKERS are separate processes
that never see driver sys.path mutations — any operator whose closures
reference module functions (mapInPandas / pandas_udf /
applyInPandasWithState) would die with ModuleNotFoundError when the
host process launched from a different cwd.  Every such entry point
calls ``ensure_package_shipped`` first: one zip of the package is built
lazily and registered with addPyFile, which puts it on every worker's
sys.path (same mechanism as spark-submit --py-files).  No-op after the
first call per SparkContext, and harmless when the package is already
importable worker-side.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_datapipeline_dags_spark_shipped"


def ensure_package_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    import datapipeline_dags_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    stage = tempfile.mkdtemp(prefix="dps_pyship_")
    zip_path = shutil.make_archive(
        os.path.join(stage, "datapipeline_dags_spark"),
        "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir),
    )
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)
