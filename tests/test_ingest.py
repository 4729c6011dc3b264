"""Unit gates for the ingestion operators (operators/ingest.py).

The oracle equivalence of the three registered queries is covered by the
slow registry sweep / driver_sim; these tests pin the behaviors an oracle
diff would not localize: per-alias-class canonicalization rules, the
incremental gate's set laws, and the Gini formula's boundary values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_variance_spark.operators.ingest import (
    canonicalize_url,
    corpus_gini_by_source,
    dedup_incremental,
)
from lakehouse_variance_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonicalize_url("url").alias("c")).collect()[0]["c"]


class TestCanonicalizeUrl:
    def test_case_and_www_and_default_port(self, spark):
        assert (
            _canon(spark, "HTTPS://WWW.Example.COM:443/Path/Item")
            == "https://example.com/Path/Item"
        )

    def test_path_case_preserved(self, spark):
        # Hosts are case-insensitive; paths are NOT — /Path must survive.
        assert _canon(spark, "https://a.com/CaseSensitive").endswith(
            "/CaseSensitive"
        )

    def test_non_default_port_kept(self, spark):
        assert (
            _canon(spark, "https://a.com:8443/x") == "https://a.com:8443/x"
        )

    def test_http_default_port_stripped(self, spark):
        assert _canon(spark, "http://a.com:80/x") == "http://a.com/x"
        # 443 is NOT http's default port — must be kept.
        assert _canon(spark, "http://a.com:443/x") == "http://a.com:443/x"

    def test_tracking_params_dropped_and_rest_sorted(self, spark):
        assert (
            _canon(spark, "https://a.com/x?z=1&utm_source=tw&a=2&fbclid=abc")
            == "https://a.com/x?a=2&z=1"
        )

    def test_tracking_only_query_drops_question_mark(self, spark):
        assert _canon(spark, "https://a.com/x?utm_medium=m") == "https://a.com/x"

    def test_fragment_stripped(self, spark):
        assert _canon(spark, "https://a.com/x?b=1#section-2") == (
            "https://a.com/x?b=1"
        )

    def test_empty_query_and_no_path(self, spark):
        assert _canon(spark, "https://WWW.A.com?") == "https://a.com"


class TestDedupIncremental:
    def test_set_laws(self, spark):
        out = dedup_incremental(spark, SF_DIR)
        ingested = out.toPandas()
        docs = load_table(spark, SF_DIR, "documents")
        fp_expr = F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(F.split("text", " "))), " "
            )
        ).alias("fingerprint")
        fp = docs.select("doc_id", fp_expr)
        seen = {
            r["fingerprint"]
            for r in fp.filter(F.col("doc_id") % 10 != 0).collect()
        }
        batch = fp.filter(F.col("doc_id") % 10 == 0).toPandas()
        # 1. Nothing ingested was already seen.
        assert not (set(ingested["fingerprint"]) & seen)
        # 2. Ingested fingerprints are unique (within-batch dedup held).
        assert ingested["fingerprint"].is_unique
        # 3. Exactly the batch's unseen distinct fingerprints were ingested.
        expected = set(batch["fingerprint"]) - seen
        assert set(ingested["fingerprint"]) == expected
        # 4. Keeper is the batch-min doc_id of its fingerprint.
        firsts = batch.groupby("fingerprint")["doc_id"].min()
        for _, row in ingested.iterrows():
            assert row["doc_id"] == firsts[row["fingerprint"]]


class TestShuffleShard:
    def test_permutation_and_balance_laws(self, spark):
        from lakehouse_variance_spark.operators.ingest import (
            N_SHARDS,
            corpus_shuffle_shard,
        )

        pdf = corpus_shuffle_shard(spark, SF_DIR).toPandas()
        n_docs = load_table(spark, SF_DIR, "documents").count()
        # Every doc assigned exactly once.
        assert pdf["doc_id"].is_unique and len(pdf) == n_docs
        # Positions are 1..k contiguous within each shard.
        for _, grp in pdf.groupby("shard"):
            assert sorted(grp["pos_in_shard"]) == list(range(1, len(grp) + 1))
        # Equidistribution: no shard more than 3x the ideal share.
        assert pdf.groupby("shard").size().max() <= 3 * (len(pdf) / N_SHARDS)
        # Determinism: a second run reproduces the training order exactly.
        pdf2 = corpus_shuffle_shard(spark, SF_DIR).toPandas()
        key = ["doc_id", "shard", "pos_in_shard"]
        assert pdf.sort_values("doc_id")[key].values.tolist() == (
            pdf2.sort_values("doc_id")[key].values.tolist()
        )

    def test_order_is_shuffled_not_sequential(self, spark):
        from lakehouse_variance_spark.operators.ingest import (
            corpus_shuffle_shard,
        )

        pdf = corpus_shuffle_shard(spark, SF_DIR).toPandas()
        shard0 = pdf[pdf["shard"] == 0].sort_values("pos_in_shard")
        ids = shard0["doc_id"].tolist()
        assert ids != sorted(ids)  # training order != crawl order


class TestGini:
    def test_uniform_sizes_give_zero(self, spark, monkeypatch):
        import lakehouse_variance_spark.operators.ingest as mod

        uniform = spark.createDataFrame(
            [("s", 100)] * 8, "source string, n_chars long"
        )
        monkeypatch.setattr(
            mod, "load_table", lambda spark, sf_dir, name: uniform
        )
        row = corpus_gini_by_source(spark, SF_DIR).collect()[0]
        assert row["gini_num"] == 0 and row["gini"] == 0.0

    def test_total_concentration_approaches_one(self, spark, monkeypatch):
        import lakehouse_variance_spark.operators.ingest as mod

        skewed = spark.createDataFrame(
            [("s", 0)] * 9 + [("s", 1000)], "source string, n_chars long"
        )
        monkeypatch.setattr(
            mod, "load_table", lambda spark, sf_dir, name: skewed
        )
        row = corpus_gini_by_source(spark, SF_DIR).collect()[0]
        # G = (n-1)/n when one doc holds all mass.
        assert row["gini"] == (10 - 1) / 10

    def test_all_empty_source_yields_null_not_throw(self, spark, monkeypatch):
        import lakehouse_variance_spark.operators.ingest as mod

        empties = spark.createDataFrame(
            [("s", 0)] * 4, "source string, n_chars long"
        )
        monkeypatch.setattr(
            mod, "load_table", lambda spark, sf_dir, name: empties
        )
        row = corpus_gini_by_source(spark, SF_DIR).collect()[0]
        # den = 0: ANSI division must not throw; NULL is the agreed value.
        assert row["gini_den"] == 0 and row["gini"] is None

    def test_registered_output_bounds(self, spark):
        pdf = corpus_gini_by_source(spark, SF_DIR).toPandas()
        assert (pdf["gini"] >= 0).all() and (pdf["gini"] < 1).all()
        assert (pdf["gini_den"] > 0).all()


class TestSourceKeywords:
    def test_keyness_laws(self, spark):
        from lakehouse_variance_spark.operators.textops import (
            vocab_source_keywords,
        )

        pdf = vocab_source_keywords(spark, SF_DIR).toPandas()
        # At most 5 keywords per source, all positively associated.
        assert pdf.groupby("source").size().max() <= 5
        assert (pdf["chi2"] > 0).all()
        assert (pdf["df_in"] >= 1).all() and (pdf["df_out"] >= 0).all()
        # Ranked descending within each source.
        for _, grp in pdf.groupby("source"):
            vals = grp["chi2"].tolist()
            assert vals == sorted(vals, reverse=True)


class TestStreamIncrementalIngest:
    def test_matches_batch_semantics_and_dedups_across_batches(self, spark):
        from lakehouse_variance_spark.streaming.ingest_stream import (
            K_BATCHES,
            stream_incremental_ingest,
        )

        out = stream_incremental_ingest(spark, SF_DIR).toPandas()
        docs = load_table(spark, SF_DIR, "documents")
        fp = docs.select(
            "doc_id",
            F.md5(
                F.array_join(
                    F.array_sort(F.array_distinct(F.split("text", " "))), " "
                )
            ).alias("fingerprint"),
            (F.col("doc_id") % K_BATCHES).alias("b"),
        ).toPandas()
        # Keeper per fingerprint = smallest (arrival batch, doc_id).
        expected = (
            fp.sort_values(["fingerprint", "b", "doc_id"])
            .groupby("fingerprint")
            .first()["doc_id"]
        )
        assert out["fingerprint"].is_unique
        got = out.set_index("fingerprint")["doc_id"].sort_index()
        assert got.equals(expected.sort_index())

    def test_replayed_batch_is_a_noop(self, spark, tmp_path):
        import pyspark.sql.functions as SF

        from lakehouse_variance_spark.sources import snapshots
        from lakehouse_variance_spark.streaming.ingest_stream import (
            incremental_ingest_writer,
        )

        table = str(tmp_path / "tbl")
        writer = incremental_ingest_writer(table)
        b0 = spark.createDataFrame(
            [(1, "s", "fpA"), (2, "s", "fpA"), (3, "s", "fpB")],
            "doc_id long, source string, fingerprint string",
        )
        writer(b0, 0)
        v_after_first = snapshots.current_version(table)
        writer(b0, 0)  # replay: must not commit a new version
        assert snapshots.current_version(table) == v_after_first
        # Within-batch dedup kept min doc_id for fpA.
        rows = {
            r["fingerprint"]: r["doc_id"]
            for r in snapshots.read_snapshot(spark, table).collect()
        }
        assert rows == {"fpA": 1, "fpB": 3}
        # A later batch only lands unseen fingerprints.
        b1 = spark.createDataFrame(
            [(9, "s", "fpA"), (10, "s", "fpC")],
            "doc_id long, source string, fingerprint string",
        )
        writer(b1, 1)
        rows = {
            r["fingerprint"]: r["doc_id"]
            for r in snapshots.read_snapshot(spark, table).collect()
        }
        assert rows == {"fpA": 1, "fpB": 3, "fpC": 10}


class TestWeightedSystematicSample:
    def test_pps_laws(self, spark):
        from lakehouse_variance_spark.operators.ingest import (
            K_SAMPLE,
            sample_weighted_systematic,
        )

        pdf = sample_weighted_systematic(spark, SF_DIR).toPandas()
        docs = load_table(spark, SF_DIR, "documents").toPandas()
        total = docs["n_chars"].sum()
        step = total / K_SAMPLE
        # Every selected doc is real, selected at most once.
        assert pdf["doc_id"].is_unique
        assert set(pdf["doc_id"]) <= set(docs["doc_id"])
        # Exactly K sample points land; with max weight < step each point
        # hits a distinct doc, so the sample size is exactly K.
        assert docs["n_chars"].max() < step
        assert len(pdf) == K_SAMPLE
        # first_point indices are exactly 0..K-1 (every point consumed).
        assert sorted(pdf["first_point"]) == list(range(K_SAMPLE))
        # Size-proportional: the sample's mean doc length must exceed the
        # corpus mean (PPS favors heavy docs; equality only if uniform).
        assert pdf["n_chars"].mean() > docs["n_chars"].mean()

    def test_deterministic(self, spark):
        from lakehouse_variance_spark.operators.ingest import (
            sample_weighted_systematic,
        )

        a = sample_weighted_systematic(spark, SF_DIR).toPandas()
        b = sample_weighted_systematic(spark, SF_DIR).toPandas()
        assert a.sort_values("doc_id").values.tolist() == (
            b.sort_values("doc_id").values.tolist()
        )
