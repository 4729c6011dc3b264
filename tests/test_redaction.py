"""Semantic invariants for redaction.py (PII scrub + collocations).

Oracle equivalence runs in test_registry_oracle; these pin what the hash
can't see: the redaction actually removed every injected pattern, and the
PMI arithmetic is the exact ratio of the counts it reports.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from lakehouse_variance_spark import registry
from lakehouse_variance_spark.operators.redaction import EMAIL_RE, IPV4_RE, PHONE_RE
from tests.conftest import SF_DIR

registry.load_all()


def test_pii_counts_follow_injection_rule(spark):
    """Each doc gets an email iff doc_id%3!=0, an IP iff doc_id%2==0,
    and exactly one phone — the counts must report exactly that."""
    rows = registry.QUERIES["text_pii_redact"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_emails == (1 if r.doc_id % 3 != 0 else 0)
        assert r.n_ips == (1 if r.doc_id % 2 == 0 else 0)
        assert r.n_phones == 1


def test_pii_redaction_removes_every_pattern(spark):
    """Rebuild the redacted text path (pre-md5) and scan it with the same
    regexes: zero survivors, and the placeholder tokens are present."""
    from lakehouse_variance_spark.tables import load_table

    doc = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(
            doc % 3 != 0,
            F.concat(
                F.lit(" contact user"),
                doc.cast("string"),
                F.lit("@mail-"),
                (doc % 7).cast("string"),
                F.lit(".example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            doc % 2 == 0,
            F.concat(
                F.lit(" from 10."),
                (doc % 256).cast("string"),
                F.lit("."),
                ((doc * 7) % 256).cast("string"),
                F.lit("."),
                (doc % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.concat(F.lit(" call +1-555-"), F.lpad((doc % 10000).cast("string"), 4, "0")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(injected, EMAIL_RE, "[EMAIL]"), IPV4_RE, "[IP]"
        ),
        PHONE_RE,
        "[PHONE]",
    )
    out = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", redacted.alias("r"))
        .collect()
    )
    email, ip, phone = (re.compile(p) for p in (EMAIL_RE, IPV4_RE, PHONE_RE))
    for row in out:
        assert not email.search(row.r)
        assert not ip.search(row.r)
        assert not phone.search(row.r)
        assert "[PHONE]" in row.r
        if row.doc_id % 3 != 0:
            assert "[EMAIL]" in row.r
        if row.doc_id % 2 == 0:
            assert "[IP]" in row.r


def test_pii_redact_plan_is_narrow(spark):
    """The scrub itself is a per-row map: the only exchange in the plan is
    the final deterministic ORDER BY (range partitioning for output), and
    no Python UDF appears anywhere."""
    df = registry.QUERIES["text_pii_redact"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    body = plan.split("rangepartitioning")[0]
    assert "Exchange hashpartitioning" not in body


def test_bigram_pmi_arithmetic_and_bounds(spark):
    rows = registry.QUERIES["text_bigram_pmi"](spark, SF_DIR).collect()
    assert len(rows) == 20
    n = rows[0].n
    for r in rows:
        assert r.n == n  # one corpus total
        assert 0 < r.co <= min(r.c1, r.c2)
        # exact IEEE recomputation of the ratio from the reported counts
        assert r.pmi_ratio == (float(r.co) * float(r.n)) / (
            float(r.c1) * float(r.c2)
        )
    # descending by co with (w1, w2) tiebreak — the LIMIT is deterministic
    keys = [(-r.co, r.w1, r.w2) for r in rows]
    assert keys == sorted(keys)


def test_bigram_pmi_broadcasts_vocab_tables(spark):
    plan = (
        registry.QUERIES["text_bigram_pmi"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_cms_topk_envelope(spark):
    """CMS never undercounts; overcount bounded by eps*N; ordering is a
    deterministic top-k."""
    pdf = registry.QUERIES["vocab_cms_topk"](spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    assert pdf.never_undercount.all()
    assert pdf.overcount_in_envelope.all()
    keys = list(zip(-pdf.n_exact, pdf.w))
    assert keys == sorted(keys)


def test_bigram_lm_fluency_laws(spark):
    from lakehouse_variance_spark.operators.redaction import _LM_GRID

    rows = registry.QUERIES["text_bigram_lm_fluency"](spark, SF_DIR).collect()
    assert rows, "every multi-token document scores"
    docs = {
        r.doc_id: r.n_tokens
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
        .collect()
    }
    scored = {r.doc_id for r in rows}
    for doc_id, n_tokens in docs.items():
        # exactly the >=2-token documents are scored, with n-1 bigrams
        assert (doc_id in scored) == (n_tokens >= 2)
    for r in rows:
        assert r.n_bigrams == docs[r.doc_id] - 1
        # quantized probabilities live on [0, 2^20]; the mean in [0, 1]
        assert 0 <= r.q_sum <= r.n_bigrams * _LM_GRID
        assert 0.0 <= r.lm_fluency <= 1.0
        # exact IEEE recomputation from the reported integers
        assert r.lm_fluency == float(r.q_sum) / float(r.n_bigrams) / float(
            _LM_GRID
        )


def test_bpe_train_matches_pure_python_reference(spark):
    from lakehouse_variance_spark.operators.redaction import (
        BPE_TRAIN_ROUNDS,
        _bpe_train_merges,
    )

    got = [
        (r.round, r.left, r.right, r.merged, r.pair_count)
        for r in _bpe_train_merges(spark, SF_DIR).collect()
    ]

    # pure-Python greedy BPE (subword-nmt semantics) on the same counts
    wc: dict[tuple, int] = {}
    for row in (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .collect()
    ):
        for w in row.text.split(" "):
            if len(w) >= 2:
                key = tuple(w)
                wc[key] = wc.get(key, 0) + 1
    want = []
    for rnd in range(1, BPE_TRAIN_ROUNDS + 1):
        pairs: dict[tuple, int] = {}
        for toks, c in wc.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] = (
                    pairs.get((toks[i], toks[i + 1]), 0) + c
                )
        if not pairs:
            break
        # argmax with (count DESC, pair ASC) tie-break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rnd, a, b, a + b, cnt))
        new_wc: dict[tuple, int] = {}
        for toks, c in wc.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            key = tuple(out)
            new_wc[key] = new_wc.get(key, 0) + c
        wc = new_wc
    assert got == want
