"""Python-worker daemon with preloaded heavy imports.

PySpark's worker daemon forks a child per task-slot; each child that
runs an Arrow/pandas UDF then pays the full ``import pandas`` +
``import pyarrow`` cost (~150-400 ms each) on first use.  On a 32-slot
local node the first Arrow stage's wave of cold workers serializes
several seconds of pure import time (measured: 5.3 s cold vs 0.9 s warm
for the q41 transform at sf0.1).

Importing the heavy modules HERE — in the daemon process, before any
fork — lets every forked worker inherit the already-initialized modules
through copy-on-write memory, so a cold worker is as fast as a warm
one.  The same pattern a production cluster uses via
``spark.python.daemon.module`` (this is standard public Spark
configuration surface, ``python/pyspark/daemon.py`` upstream).

Selected by session.get_spark when this package is importable from the
worker's PYTHONPATH; everything degrades gracefully (plain imports
guarded) because a daemon that dies on import would take every Python
stage down with it.
"""

from __future__ import annotations

try:  # heavy libs first: these dominate cold-start
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401  (lazy-loaded by serializers)
    from dateutil import parser as _du  # noqa: F401  (fuzzy-date UDF)
except Exception:  # pragma: no cover - missing optional lib is fine
    pass

try:  # the worker module itself + Arrow serializers
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.worker  # noqa: F401
except Exception:  # pragma: no cover
    pass

try:
    # cloudpickle serializes this package's UDFs BY REFERENCE, so every
    # forked worker imports these modules on first task; importing them
    # here instead makes that a copy-on-write no-op across all slots
    import aquiles_etl_pipeline_spark.functions.exact  # noqa: F401
    import aquiles_etl_pipeline_spark.llmdata  # noqa: F401
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
