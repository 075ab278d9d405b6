"""Ship era_parser_spark to executors.

Python UDF / mapInPandas closures are pickled by reference to this module,
so executor workers must be able to `import era_parser_spark`.  When the
driver runs from the repo root that's free (cwd on sys.path); from anywhere
else — or on a real cluster — the package must travel with the job.  This
zips the package once per session and registers it with addPyFile (the
standard mechanism; works identically in local and cluster mode).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SESSION_FLAG = "_era_parser_spark_shipped"


def ensure_package_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SESSION_FLAG, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"era_parser_spark_pkg_{os.getuid()}.zip"
    )
    tmp = zpath + ".tmp"
    with zipfile.ZipFile(tmp, "w") as z:
        for dirpath, _, files in os.walk(pkg_dir):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    setattr(sc, _SESSION_FLAG, True)
