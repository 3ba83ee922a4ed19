"""Sources & sinks.

The reference exposes dask.bag's module-level sources through its import
surface (``src/dask_obj/core.py:6``): ``from_sequence``, ``from_delayed``,
``read_text``, ``read_avro``, ``from_url``, ``range``.  The Spark-native
equivalents live here, as thin wrappers over ``spark.read`` so Catalyst
keeps pushdown/pruning, plus the driver-testdata loader used throughout
tests and queries.
"""

from dask_obj_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)
from dask_obj_spark.sources.avro_io import read_avro, to_avro
from dask_obj_spark.sources.io import (
    from_sequence,
    from_url,
    range_frame,
    read_csv,
    read_json,
    read_parquet,
    read_text,
    write_sink,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "from_sequence",
    "from_url",
    "range_frame",
    "read_csv",
    "read_json",
    "read_avro",
    "read_parquet",
    "read_text",
    "to_avro",
    "write_sink",
]
