"""Analytic operator coverage over the TPC-H-ish testdata: joins,
windows, aggregations, set ops, sorts, top-k, json/array functions —
the SURVEY.md §2.12 extension rows."""

from __future__ import annotations


def register_all() -> None:
    pass
