"""Connectors: the NATS CDC source/sink (SURVEY.md §4.2 item 1 — the one
true connector the engine needs) plus the batch parquet scan/sink wrappers.
"""

from .nats import register_nats_source  # noqa: F401
