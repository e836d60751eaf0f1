"""Out-of-window oracle coverage: every _TAIL query (registered but
outside the driver's ~50-entry correctness window this round) is
oracle-checked here at sf0.001, so a regression in a rotated-out query
cannot land unverified between driver rounds (ADVICE r3)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_contract import TABLES, compare  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", entry_mod._ordered()[entry_mod._WINDOW:])
def test_tail_query_matches_oracle(spark, oracle_con, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert name in qs, f"_TAIL entry {name} not registered"
    sdf = qs[name](spark, SF_DIR).toPandas()
    odf = oracle_con.execute(oracles[name]).df()
    err = compare(sdf, odf)
    assert err is None, f"{name}: {err}"
