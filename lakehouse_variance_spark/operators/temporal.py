"""Temporal join operators: as-of (latest-at-or-before) joins.

The reference surface has no range/as-of/interval joins (SURVEY.md §2A
"Joins" — none appear in the 99-query set), so this is a north-star
training-pipeline extension: aligning event streams against the most recent
prior fact (latest model checkpoint, last session marker, most recent
click) is a staple of feature-engineering pipelines.

Spark has no built-in as-of join, and the naive encoding — an inequality
join followed by a per-left-row argmax — shuffles the fact table twice and
explodes intermediate pairs (every right row at-or-before every left row).
The implementation here is the single-shuffle union-marker pattern:

1. UNION the two sides with a marker column (right=0, left=1), aligning
   schemas with typed nulls.
2. One window over (key) ORDER BY (ts, marker): ``last(right_payload,
   ignoreNulls=True)`` carries the most recent right row forward to every
   subsequent row in time order. Ordering the marker right-before-left makes
   the join inclusive (at-or-before, ``right.ts <= left.ts``) on ties.
3. Keep the left rows.

Cost: exactly ONE shuffle of |left|+|right| rows on the join key — the same
exchange a plain equi-join would pay — and no pair blow-up, which is what
makes it hold at 100 TB. Skewed keys (one user with millions of events)
salt the same way any window does: range-partition within key by time
bucket, carry the last value across bucket boundaries with a second pass.

The DuckDB oracle uses its native ``ASOF LEFT JOIN`` — an independent
engine's implementation of the same semantics, not a restatement of ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``right_payload``
    columns of the latest ``right`` row with the same ``on`` key and
    ``right.ts <= left.ts`` (NULLs when no such row exists).

    Single shuffle on ``on``; see the module docstring for the argument.
    ``right_payload`` names must not collide with ``left`` columns.
    """
    left_cols = [c for c in left.columns if c not in (on, ts)]
    r = right.select(
        on,
        ts,
        F.lit(0).alias("_m"),
        *[F.col(c) for c in right_payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        on,
        ts,
        F.lit(1).alias("_m"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right_payload
        ],
        *[F.col(c) for c in left_cols],
    )
    w = (
        W.partitionBy(on)
        .orderBy(ts, "_m")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l.unionByName(r).select(
        "*",
        *[
            F.last(F.when(F.col("_m") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in right_payload
        ],
        F.last(F.when(F.col("_m") == 0, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias("_asof_ts"),
    )
    return (
        carried.filter(F.col("_m") == 1)
        .drop("_m", *right_payload)
        .withColumnsRenamed({f"_asof_{c}": c for c in right_payload})
        .withColumnRenamed("_asof_ts", f"{ts}_right")
    )


@register(
    "asof_join_latest_click",
    oracle="""
    WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events)
    SELECT e.event_id,
           e.user_id,
           c.event_id AS click_event_id,
           date_diff('microsecond', c.ts, e.ts) AS gap_us
    FROM (SELECT * FROM ev WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') c
        ON e.user_id = c.user_id AND c.ts <= e.ts
    """,
)
def asof_join_latest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'error' event, the user's most recent 'click' at-or-before
    it (event id + gap in integer microseconds; NULLs when the user never
    clicked before). Verified against DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    joined = asof_join(
        errors, clicks, on="user_id", ts="ts", right_payload=["click_event_id"]
    )
    # ts is TIMESTAMP_NTZ in the parquet; unix_micros requires TIMESTAMP.
    # The session runs with spark.sql.session.timeZone=UTC, so the cast is a
    # fixed zero offset and the difference matches DuckDB's naive date_diff.
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("ts_right").cast("timestamp")
    )
    return joined.select(
        "event_id", "user_id", "click_event_id", gap.alias("gap_us")
    )


# Attribution window: a purchase attributes to the latest prior click
# within this many microseconds (1 hour).
ATTRIB_WINDOW_US = 3_600_000_000


@register(
    "cogroup_asof_attribution",
    oracle=f"""
    WITH p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'click'),
    j AS (
        SELECT p.user_id, p.ts, cl.ts AS click_ts
        FROM p
        ASOF LEFT JOIN c cl
            ON p.user_id = cl.user_id AND cl.ts <= p.ts)
    SELECT user_id,
           count(*) AS n_purchases,
           CAST(sum(CASE WHEN click_ts IS NOT NULL
                          AND date_diff('microsecond', click_ts, ts)
                              <= {ATTRIB_WINDOW_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed
    FROM j
    GROUP BY user_id
    """,
)
def cogroup_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution via COGROUPED pandas: purchases and
    clicks are grouped by user independently, and each user's two frames
    meet in one ``cogroup(...).applyInPandas`` call running
    ``pandas.merge_asof`` — the idiomatic two-input per-key Python
    operator (the API the engine offers when per-key logic needs BOTH
    streams materialized side by side, e.g. existing single-node pandas
    attribution code lifted into the cluster as-is).

    Contrast with :func:`asof_join` above: the union-marker form stays
    JVM-side and is the hot-path choice; cogroup is the escape hatch when
    the per-key logic already exists in pandas. Both sides shuffle once
    on the key — the same exchange — and each group's frames must fit in
    executor memory (per-USER event history: bounded in practice; salt or
    pre-trim hot keys otherwise).

    The window test compares exact MICROSECOND differences, not
    date_diff('second') — second-granularity boundary counting truncates
    differently from pandas' total_seconds on sub-second offsets.
    Verified against DuckDB's native ASOF LEFT JOIN.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts"
    )

    def attribute(key, pdf_purchases, pdf_clicks):
        if len(pdf_purchases) == 0:
            return pd.DataFrame(
                columns=["user_id", "n_purchases", "n_attributed"]
            )
        p = pdf_purchases.sort_values("ts")
        if len(pdf_clicks) == 0:
            attributed = 0
        else:
            c = pdf_clicks.sort_values("ts").rename(
                columns={"ts": "click_ts"}
            )
            m = pd.merge_asof(
                p, c[["click_ts"]].assign(user_id=key[0]),
                left_on="ts", right_on="click_ts",
                direction="backward",
            )
            gap_us = (
                (m["ts"] - m["click_ts"]).dt.total_seconds() * 1_000_000
            )
            attributed = int(
                (m["click_ts"].notna() & (gap_us <= ATTRIB_WINDOW_US)).sum()
            )
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_purchases": [len(p)],
                "n_attributed": [attributed],
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            attribute,
            "user_id bigint, n_purchases bigint, n_attributed bigint",
        )
    )
