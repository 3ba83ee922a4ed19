"""Extension operators beyond the reference surface (SURVEY.md Tier E):
deduplication, similarity search, text analysis, multimodal columns,
as-of/range joins. Each is a composition of DataFrame built-ins first,
Pandas-UDF-backed only where built-ins can't express the semantics.
"""
