"""Stratified sampling: seeded determinism, fraction semantics, mixture
membership."""

from __future__ import annotations

from lakehouse_variance_spark import registry
from lakehouse_variance_spark.operators.relational import SAMPLE_FRACTIONS
from tests.conftest import SF_DIR_MEDIUM

registry.load_all()


def _result(spark):
    return {
        r["source"]: (r["n_sampled"], r["first_doc_id"])
        for r in registry.QUERIES["sample_stratified"](
            spark, SF_DIR_MEDIUM
        ).collect()
    }


def test_stratified_sample_is_deterministic(spark):
    assert _result(spark) == _result(spark)


def test_stratified_sample_fractions_and_membership(spark):
    got = _result(spark)
    # Only sources in the fraction map survive.
    assert set(got) <= set(SAMPLE_FRACTIONS)
    per_source = 500 // 20  # sf0.01: 500 docs over 20 uniform sources
    # fraction 1.0 keeps everything; smaller fractions keep a strict subset
    # in rough proportion (Bernoulli, so allow wide but ordered bounds).
    assert got["src0"][0] == per_source
    assert 0 < got["src1"][0] < per_source
    assert got["src3"][0] < got["src1"][0] + per_source * 0.4
