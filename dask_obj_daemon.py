"""PySpark worker daemon with two per-task overheads removed (guide §4:
the Python boundary — per-task work that is pure fixed cost).

Launched by the JVM via the public ``spark.python.daemon.module`` config
(set in :func:`dask_obj_spark.session.get_spark`).  This module MUST stay
top-level (not inside ``dask_obj_spark``): ``python -m`` imports the
package ``__init__`` first, which imports pyspark — and the fix below has
to run BEFORE pyspark is imported.

What it fixes, measured on this host (local[32], trivial 4096-task RDD
stage — the b28 bench probe shape):

1. **Zip/jar re-scans in ``importlib.invalidate_caches()``.**  Every task,
   ``pyspark.worker.main`` calls ``setup_spark_files`` which ends with
   ``importlib.invalidate_caches()``.  The worker factory prepends
   ``$SPARK_HOME/python/lib/pyspark.zip`` + the py4j zip to the daemon's
   ``PYTHONPATH`` (and this deployment also leaks a spark-core *jar* onto
   ``sys.path``), so the first pyspark import populates
   ``sys.path_importer_cache`` with ~30 ``zipimporter`` entries — and
   CPython's ``zipimporter.invalidate_caches()`` eagerly RE-READS the
   whole zip directory.  Measured: ~140 ms per task (~5 ms per pyspark.zip
   package dir + ~22 ms per jar entry), i.e. 4096-task stages spend ~95%
   of their executor time re-reading zip TOCs.  Fix: drop zip/jar entries
   from ``sys.path`` before anything imports pyspark — the identical
   pyspark/py4j version is installed in site-packages (the driver already
   runs from it), so workers import the same code from plain directories
   and ``invalidate_caches`` has no zipimporter left to thrash.

2. **Full ``gc.collect()`` after every task.**  The upstream daemon's
   reuse loop runs a full collection over the entire imported module
   graph between tasks (~20-30 ms once pandas/numpy are loaded).  Replace
   with a young-generation collect per task plus a full pass every
   ``_FULL_GC_EVERY`` tasks: same bounded-memory contract (cycles are
   still reclaimed, just batched), ~100x cheaper steady state.

Both fixes are results-neutral: they change worker lifecycle cost only,
never task semantics.  If anything here fails, fall back to vanilla
behaviour loudly rather than half-patched.
"""

from __future__ import annotations

import sys


def _scrub_archive_paths() -> None:
    """Remove .zip/.jar entries from sys.path so pyspark resolves from
    site-packages and no zipimporter ever lands in path_importer_cache.

    Interpreter startup already probed the PYTHONPATH archives while
    importing runpy/encodings (before this module ran), so the archive
    zipimporters are ALREADY cached — purge those entries as well;
    nothing re-creates them once the paths are gone from sys.path."""
    archives = {p for p in sys.path if p.endswith((".zip", ".jar"))}
    sys.path[:] = [p for p in sys.path if p not in archives]
    for key in list(sys.path_importer_cache):
        if any(key == a or key.startswith(a + "/") for a in archives):
            del sys.path_importer_cache[key]


_scrub_archive_paths()

# Import AFTER the scrub so pyspark (and py4j) come from site-packages.
import pyspark.daemon as _daemon  # noqa: E402

_FULL_GC_EVERY = 32


class _AmortizedGC:
    """Stand-in for the ``gc`` module inside ``pyspark.daemon``'s reuse
    loop: young-gen collect per task, full collect every N tasks."""

    def __init__(self) -> None:
        self._n = 0

    def collect(self, generation: int = 2) -> int:
        import gc

        self._n += 1
        if self._n % _FULL_GC_EVERY == 0:
            return gc.collect()
        return gc.collect(1)

    def __getattr__(self, name: str):
        import gc

        return getattr(gc, name)


_daemon.gc = _AmortizedGC()


_orig_worker = _daemon.worker


def _nodelay_worker(sock, authenticated):
    """Set TCP_NODELAY on the JVM<->worker data socket before entering
    the task loop: the per-task handshake is a sequence of small
    request/response messages, the same Nagle/delayed-ACK territory as
    the driver's py4j channel (see session._enable_py4j_nodelay).
    No-op for unix-domain sockets."""
    import socket as _socket

    try:
        sock.setsockopt(_socket.IPPROTO_TCP, _socket.TCP_NODELAY, 1)
    except OSError:
        pass
    return _orig_worker(sock, authenticated)


_daemon.worker = _nodelay_worker


if __name__ == "__main__":
    _daemon.manager()
