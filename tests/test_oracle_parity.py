"""Oracle parity for every registered query (mimics the driver's
CORRECTNESS gate, but stricter: exact value equality at sf0.01)."""

from __future__ import annotations

import pytest

from node_cdc_nats_spark import registry

from .conftest import SF_DIR_ORACLE
from .oracle_diff import compare

registry.load_all()

ORACLE_CASES = sorted(registry.ORACLES)
ROWS_ONLY_CASES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, name):
    problems = compare(
        spark, name, registry.QUERIES[name], registry.ORACLES[name], SF_DIR_ORACLE
    )
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR_ORACLE)
    assert df.count() >= 0
    assert df.columns
