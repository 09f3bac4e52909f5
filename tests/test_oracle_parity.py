"""Oracle parity for every registered query (mimics the driver's
CORRECTNESS gate, but stricter: exact value equality at sf0.01)."""

from __future__ import annotations

import pytest

from node_cdc_nats_spark import registry

from .conftest import SF_DIR_ORACLE
from .oracle_diff import compare

registry.load_all()

ORACLE_CASES = sorted(registry.ORACLES)


def test_every_query_has_an_oracle():
    """All 124 registered queries carry a DuckDB oracle — the driver never
    falls back to its weaker rows-only check. (Replaces a parametrized
    rows-only test whose case set went empty in r4 and skipped forever.)"""
    assert set(registry.QUERIES) == set(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, name):
    problems = compare(
        spark, name, registry.QUERIES[name], registry.ORACLES[name], SF_DIR_ORACLE
    )
    assert not problems, "\n".join(problems)
