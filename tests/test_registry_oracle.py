"""The correctness gate, run locally: every registered query with an oracle is
compared against DuckDB at sf0.001 (fast) — mirroring the driver's t2 check.
A second marker-selected pass runs sf0.01 (what the driver actually uses).
"""

from __future__ import annotations

import pytest

from lakehouse_variance_spark import registry
from tests.conftest import SF_DIR, SF_DIR_MEDIUM, assert_matches_oracle

registry.load_all()

ORACLE_QUERIES = sorted(registry.ORACLES)
ROWS_ONLY_QUERIES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match_small(spark, duck, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, registry.ORACLES[name], SF_DIR)


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match_medium(spark, duck, name):
    df = registry.QUERIES[name](spark, SF_DIR_MEDIUM)
    assert_matches_oracle(df, duck, registry.ORACLES[name], SF_DIR_MEDIUM)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle must still run and return a stable schema."""
    df = registry.QUERIES[name](spark, SF_DIR)
    assert df.columns  # non-empty schema
    assert df.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_approx_count_distinct_envelope(spark, duck):
    """The HLL++ estimate must land within the configured 2% rsd (3 sigma)
    of the exact distinct count per group."""
    from lakehouse_variance_spark import registry

    got = {
        r["l_returnflag"]: (r["n_parts"], r["in_envelope"])
        for r in registry.QUERIES["agg_approx_count_distinct"](spark, SF_DIR).collect()
    }
    exact = dict(
        duck.sql(
            f"SELECT l_returnflag, count(DISTINCT l_partkey) "
            f"FROM read_parquet('{SF_DIR}/lineitem.parquet') GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for flag, (n_parts, in_env) in got.items():
        assert n_parts == exact[flag]  # the emitted count IS exact
        assert in_env  # and the sketch estimate sat inside the envelope


def test_approx_percentiles_envelope(spark, duck):
    """The Greenwald-Khanna sketch at accuracy=10000 must land within the
    exact quantile neighborhood: the estimate is some element whose rank is
    within n/accuracy of the target rank, so compare against the exact
    discrete quantile with a rank-derived value tolerance."""
    rows = registry.QUERIES["agg_approx_percentiles"](spark, SF_DIR).collect()
    exact = {
        r[0]: (r[1], r[2])
        for r in duck.sql(
            f"SELECT event_type, quantile_disc(value, 0.50), "
            f"quantile_disc(value, 0.99) "
            f"FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"
        ).fetchall()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        p50, p99 = exact[r["event_type"]]
        # the query's own envelope booleans must hold, AND the exact rank
        # brackets must straddle DuckDB's independent discrete quantile.
        assert r["p50_in_envelope"] and r["p99_in_envelope"]
        assert r["p50_lo"] <= p50 <= r["p50_hi"]
        assert r["p99_lo"] <= p99 <= r["p99_hi"]


def test_hll_sketch_union_envelope(spark, duck):
    """DataSketches HLL (lgK=12, ~1.6% rsd): every per-flag estimate AND
    the merged-union estimate must land near the exact distinct counts —
    the union must come from merging sketches, never rescanning rows."""
    rows = registry.QUERIES["agg_hll_sketch_union"](spark, SF_DIR).collect()
    got = {r["l_returnflag"]: (r["n_parts"], r["in_envelope"]) for r in rows}
    exact = dict(
        duck.sql(
            f"SELECT l_returnflag, count(DISTINCT l_partkey) "
            f"FROM read_parquet('{SF_DIR}/lineitem.parquet') GROUP BY 1"
        ).fetchall()
    )
    exact["ALL"] = duck.sql(
        f"SELECT count(DISTINCT l_partkey) "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchall()[0][0]
    assert set(got) == set(exact)
    for flag, (n_parts, in_env) in got.items():
        assert n_parts == exact[flag]
        assert in_env
    union_rows = [r for r in rows if r["is_union"] == 1]
    assert len(union_rows) == 1
    assert union_rows[0]["n_rows"] == sum(
        r["n_rows"] for r in rows if r["is_union"] == 0
    )


def test_hll_intersect_envelope(spark, duck):
    """Inclusion-exclusion overlap from HLL sketches: the intersect
    estimate must land near the exact channel-overlap count. I-E
    compounds three estimates' errors, so the envelope is wider than a
    single sketch's rsd (10% + slack)."""
    r = registry.QUERIES["hll_intersect_estimate"](spark, SF_DIR).collect()[0]
    exact = duck.sql(
        f"""SELECT count(*) FROM (
            SELECT l_partkey FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_returnflag = 'A'
            INTERSECT
            SELECT l_partkey FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_returnflag = 'N')"""
    ).fetchall()[0][0]
    # the exact inclusion-exclusion count the query emits must equal
    # DuckDB's independent INTERSECT count, and every sketch estimate must
    # sit inside its declared envelope.
    assert r["n_intersect"] == exact
    assert r["a_in_envelope"] and r["n_in_envelope"]
    assert r["union_in_envelope"] and r["intersect_in_envelope"]


def test_readme_counts_match_registry():
    """README's correctness counts are emitted by scripts/gen_counts.py
    from the live registry; hand-edited drift fails here (VERDICT r7 #3)."""
    import os
    import re

    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    text = open(readme, encoding="utf-8").read()
    m = re.search(r"\((\d+) oracle-checked \+ (\d+) law-gated rows-only", text)
    assert m, "README counts sentence missing"
    assert int(m.group(1)) == len(ORACLE_QUERIES)
    assert int(m.group(2)) == len(ROWS_ONLY_QUERIES)
