"""Ship the zombi_spark package to Python workers at runtime.

The driver contract imports this repo via ``sys.path`` manipulation from an
arbitrary working directory, so executor-side Python workers may not be able
to ``import zombi_spark`` — and cloudpickle serializes module-level
functions (e.g. the mapInPandas codec stubs in operators/multimodal.py) by
reference, not by value. ``ensure_package_on_workers`` zips the package once
per process and registers it with ``SparkContext.addPyFile`` once per
context, which inserts it on every worker's ``sys.path`` (works after the
context is already running, unlike PYTHONPATH).

On a real cluster this is the same mechanism as ``--py-files``: one small
zip broadcast to executors, O(package size), independent of data scale.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_CONTEXTS: set[int] = set()


def _package_zip() -> str:
    import zombi_spark

    pkg_root = os.path.dirname(os.path.abspath(zombi_spark.__file__))
    zpath = os.path.join(tempfile.gettempdir(), f"zombi_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _dirs, files in os.walk(pkg_root):
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.join("zombi_spark", os.path.relpath(full, pkg_root))
                        zf.write(full, rel)
        os.replace(tmp, zpath)
    return zpath


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Idempotently make ``import zombi_spark`` work on Python workers."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_CONTEXTS:
        return
    sc.addPyFile(_package_zip())
    _SHIPPED_CONTEXTS.add(key)
