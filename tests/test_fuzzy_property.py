"""Property-based test of the SymSpell deletion-neighborhood candidate
generation (operators/cleaning.py:vocab_fuzzy_pairs): over randomized
vocabularies, the deletion-neighborhood equi-join must find EXACTLY the
pairs a brute-force Levenshtein sweep finds at distance <= 2 — the
completeness guarantee the 100 TB path relies on (missing a candidate is
silent data corruption; the oracle comparison alone only checks the
fixture vocabulary)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    deadline=None,
    max_examples=20,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ALPHA = "abc"  # tiny alphabet maximizes near-collisions per example

tokens_strategy = st.lists(
    st.text(alphabet=ALPHA, min_size=1, max_size=6),
    min_size=2,
    max_size=12,
    unique=True,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _neighborhood(tok: str, depth: int = 2) -> set[str]:
    out = {tok}
    frontier = {tok}
    for _ in range(depth):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


@given(tokens_strategy)
@settings(**_SETTINGS)
def test_deletion_neighborhood_candidates_are_complete(tokens):
    """Pure-python mirror of the operator's candidate rule: every
    brute-force pair at distance <= 2 must share a depth-2 deletion
    variant (completeness); the verify step then makes precision exact,
    so candidates ⊇ true pairs ⇒ final output = true pairs."""
    hoods = {t: _neighborhood(t) for t in tokens}
    for i, a in enumerate(tokens):
        for b in tokens[i + 1 :]:
            if _lev(a, b) <= 2:
                assert hoods[a] & hoods[b], (
                    f"pair ({a!r}, {b!r}) at distance {_lev(a, b)} shares "
                    f"no depth-2 deletion variant — the equi-join would "
                    f"miss it"
                )


def test_operator_equals_bruteforce_on_crafted_vocab(spark, tmp_path):
    """End-to-end on a crafted corpus: run the REAL operator on a parquet
    documents table whose vocabulary contains known near-pairs, and
    compare against the brute-force pair set."""
    import pandas as pd

    from lakehouse_variance_spark import registry

    registry.load_all()
    words = ["cat", "cart", "card", "dog", "dot", "spark", "spork", "xyz"]
    pdf = pd.DataFrame(
        {
            "doc_id": range(2),
            "text": [" ".join(words[:4]), " ".join(words[4:])],
            "lang": ["en", "en"],
            "source": ["src0", "src0"],
            "n_chars": [1, 1],
        }
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["token_a"], r["token_b"], r["dist"])
        for r in registry.QUERIES["vocab_fuzzy_pairs"](
            spark, sf_dir
        ).collect()
    }
    expect = {
        (min(a, b), max(a, b), _lev(a, b))
        for i, a in enumerate(words)
        for b in words[i + 1 :]
        if _lev(a, b) <= 2
    }
    assert got == expect
