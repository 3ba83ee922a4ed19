"""Scalar function surface: the method-name → Catalyst function dispatch
table used by ``Expr`` compilation and ``ObjectFrame.call`` so that common
element methods (``.upper()``, ``.strip()``, ``.get(k)``, …) execute
JVM-side inside whole-stage codegen instead of as Python UDFs.
"""

from dask_obj_spark.functions.dispatch import COLUMN_METHODS, dispatch_method

__all__ = ["COLUMN_METHODS", "dispatch_method"]
