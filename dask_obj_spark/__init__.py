"""dask_obj_spark — a PySpark-native analytics engine with the capability
surface of the reference object-collection library ``brl0/dask-obj``.

Three public abstractions (see SURVEY.md for the capability map):

- :class:`ObjectFrame` — distributed collection of objects over a Spark
  ``DataFrame`` with element-wise attribute/item/method broadcasting,
  ``map``/``flatten``/``persist``/``compute``, generic two-phase
  ``reduction``, and value-frequency ``counts``
  (reference: ``src/dask_obj/core.py:34-108``).
- :class:`DelayedObjects` — task-parallel collection with completion-order
  iteration and full operator broadcasting
  (reference: ``src/dask_obj/core.py:116-220``).
- :class:`Expr` — deferred expression recorder that captures
  attribute/index/call/operator chains, replays them against Python values,
  and compiles to a Catalyst ``Column``
  (reference: ``src/dask_obj/expr.py:259-435``).

Everything is DataFrame/Catalyst-first: the facade builds logical plans and
lets Spark optimize; Python-side execution happens only at explicitly
documented boundaries (``compute``, pickled-object mode, UDF fallback).
"""

from dask_obj_spark.core import ObjectFrame
from dask_obj_spark.delayed import DelayedObjects
from dask_obj_spark.expr import Expr, compile_expr, replace_root_value
from dask_obj_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "ObjectFrame",
    "DelayedObjects",
    "Expr",
    "compile_expr",
    "replace_root_value",
    "get_spark",
    "__version__",
]
