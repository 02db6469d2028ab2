"""Ship this package to Spark's Python workers.

Pandas UDFs and Python DataSources are cloudpickled BY REFERENCE to their
defining module, so executor processes must be able to
``import linkedin_iceberg_spark`` — which fails when the driver script runs
outside a checkout/install.  Zipping the package once per session and
distributing it with ``addPyFile`` puts it on every worker's sys.path.
"""

from __future__ import annotations

import os


def ship_package(spark) -> None:
    if spark is None or getattr(spark, "_liceberg_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    import linkedin_iceberg_spark as pkg
    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    zpath = os.path.join(tempfile.gettempdir(),
                         "linkedin_iceberg_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join("linkedin_iceberg_spark",
                                       os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    spark._liceberg_pkg_shipped = True


def ship_to_active_session() -> None:
    from pyspark.sql import SparkSession
    ship_package(SparkSession.getActiveSession())
