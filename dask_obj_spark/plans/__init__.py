"""Plan inspection helpers: assertions over the physical plan used by
tests and the perf pass (pushdown reached the scan, join went broadcast,
codegen spans exist).
"""

from dask_obj_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = ["explain_str", "has_broadcast_join", "pushed_filters", "read_schema_columns"]
