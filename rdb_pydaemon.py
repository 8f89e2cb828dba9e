"""Custom PySpark worker daemon: pre-import the heavy Arrow-UDF
libraries ONCE, before any worker forks.

Why (PLANS.md round-7, the multimodal_jpeg_decode stall): every
mapInPandas stage forks fresh Python workers from the daemon, and each
worker re-pays ``import numpy/pandas/pyarrow`` (~0.2-0.5 s CPU). A
two-operator Arrow pipeline on 32 partitions is a 64-worker fork storm
— ~20 s of import CPU that serializes against the JVM's own stage work
under in-suite load (measured: worker ``run()`` entries staggered
0→6.8 s while per-batch decode stayed flat at 0.36 s). Importing here
means forked workers inherit the modules via copy-on-write and start in
milliseconds.

Wired by ``session.get_spark`` via ``spark.python.daemon.module`` (the
stock daemon loop is reused unchanged — this module only warms imports
then delegates). A TOP-LEVEL module (not inside the package) so the
daemon never executes the engine package's import graph. Sessions that
don't opt in (e.g. a vanilla driver session) keep the stock daemon:
correctness is identical, cold workers are just slower. Disable with
RDB_NO_PYDAEMON=1.

On a real cluster the same config applies per executor; the imports are
per-executor-daemon, not per-task.
"""

for _mod in (
    "numpy", "pandas", "pyarrow", "pyarrow.parquet",
    # round-8: the codec modules themselves — mapInPandas closures now
    # pickle BY REFERENCE (functions/multimodal._ship_package), so every
    # fresh worker imports them; preimporting here makes that a
    # copy-on-write inherit instead of a per-worker import. The package
    # __init__ is lazy (PEP 562), so this pulls only the codec graph,
    # not the engine. Guarded: sessions without the package on the
    # daemon's sys.path just lose the warm-up.
    "reactivedb_spark.functions.multimodal",
):
    try:
        __import__(_mod)
    except Exception:  # noqa: BLE001 — a missing lib just loses the warm-up
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
