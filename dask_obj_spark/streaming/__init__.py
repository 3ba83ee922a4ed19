"""Structured Streaming surface (SURVEY.md Tier E): tumbling/sliding/
session windows with watermarks over the ``events`` stream, and a custom
stateful sessionizer via ``applyInPandasWithState``.
"""
