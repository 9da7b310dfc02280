"""Operator library — one module per reference job family (SURVEY.md §2).

Every operator is a pure function ``DataFrame -> DataFrame`` (or a small
builder class), parameterized by column names so the same implementation runs
against crawl tables and the driver's TPC-H-ish tables.
"""
