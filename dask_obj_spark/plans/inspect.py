"""Physical-plan introspection (the ".explain and iterate" loop, automated).

Used in tests to assert the plans we want at 100 TB actually got planned:
filters pushed to the parquet scan, small dimensions broadcast, column
pruning in the read schema.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the formatted plan ('' if none)."""
    text = explain_str(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", text)
    return m.group(1) if m else ""


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    text = explain_str(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", text)
    if not m:
        return []
    return [part.split(":")[0] for part in m.group(1).split(",") if part]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)
