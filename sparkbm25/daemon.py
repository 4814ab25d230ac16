"""Python-worker daemon with heavy imports preloaded BEFORE forking.

Launched by the JVM instead of ``pyspark.daemon`` when
``spark.python.daemon.module=sparkbm25.daemon`` (set by session.get_spark;
SPARKBM25_DAEMON=0 restores the stock daemon). The stock daemon forks one
interpreter per worker from a parent that has only pyspark itself loaded,
so EVERY fresh worker pays the numpy + pandas + pyarrow + kernel-module
import bill (~1 s of core time each) before its first Arrow batch.
Measured on the bench host (r07): a 32-core stage whose workers all boot
fresh burns ~36 extra core-s — the first query batch after a session
start ran 9.6 s vs 1.1 s steady-state, and any stage scheduled after the
daemon's idle-worker reaper emptied the pool re-paid the same bill,
which is exactly the episodic 2-3x stage inflation the r06 bench
recorded. Importing the heavy modules ONCE here, pre-fork, lets every
worker inherit them copy-on-write: worker boot returns to a plain
fork() + socket handshake.

This is the guide's "initialise heavyweight state once per task, not per
row" taken one level up: once per MACHINE, not once per worker
(spark_optimization_guide.md §4.5's module-level-global pattern relies on
worker reuse; preloading in the daemon also covers the workers the reaper
replaces).

The module body must run ONLY under ``python -m`` (the JVM's daemon
launch): pyspark.daemon reads sys.argv at import time and calls
os.setpgid/signal handlers in manager(), so importing this module from
library code must stay side-effect free.
"""

if __name__ == "__main__":
    # Pre-fork preload. Failures must never take the daemon down — a
    # missing optional module just means workers import it themselves.
    try:  # the Arrow/pandas stack: the bulk of a worker's boot time
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        import pyarrow.compute  # noqa: F401
        import pyarrow.dataset  # noqa: F401
        import pyarrow.parquet  # noqa: F401
    except Exception:  # pragma: no cover - environment-dependent
        pass
    try:  # pyspark's Arrow serializers import pandas/pyarrow glue lazily
        import pyspark.sql.pandas.serializers  # noqa: F401
        import pyspark.sql.pandas.types  # noqa: F401
    except Exception:  # pragma: no cover
        pass
    try:
        # the engine's kernel modules (cloudpickle ships kernel closures
        # by reference, so workers import these on first task otherwise).
        # ``python -m`` puts the launch cwd on sys.path, so this resolves
        # when the driver runs from the repo root; elsewhere workers fall
        # back to the per-task pyfiles import, losing only the preload.
        import sparkbm25.analysis  # noqa: F401
        import sparkbm25.build  # noqa: F401
        import sparkbm25.codecs  # noqa: F401
        import sparkbm25.index_query  # noqa: F401
        import sparkbm25.kernels  # noqa: F401
        import sparkbm25.pipeline.dedup  # noqa: F401
        import sparkbm25.pipeline.similarity  # noqa: F401
        import sparkbm25.pipeline.textstats  # noqa: F401
        import sparkbm25.query  # noqa: F401
    except Exception:  # pragma: no cover
        pass

    from pyspark.daemon import manager

    manager()
