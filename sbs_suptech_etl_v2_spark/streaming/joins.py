"""Stream-stream interval join — §2.10's as-of/range family on streams.

The batch as-of join (q54, ``relational.purchase_asof_click``) pairs
each purchase with the latest prior click per user. On unbounded
streams Spark cannot hold "latest prior" state forever; the streaming
form is the watermarked *interval* join: purchases match clicks within
a bounded look-back window, and the watermarks let the engine drop
click state older than ``max_gap`` plus the allowed lateness — state
size stays bounded by (users active within the gap) × rate, not by
stream length.

This is the production upgrade path the reference's poll-loop ingest
never had: the same declarative join runs on the batch tables (q54's
window rewrite collapses it to one shuffle) and on live streams with
identical predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_before_purchase(
    purchases: DataFrame,
    clicks: DataFrame,
    max_gap: str = "1 hour",
    lateness: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked interval join: purchase ⋈ clicks within ``max_gap``.

    Both inputs must carry ``(user_id, ts, event_id)``. Every matching
    (purchase, click) pair within the look-back interval is emitted —
    the streaming relaxation of as-of's "latest only" (a downstream
    max-by(click_ts) per purchase recovers the as-of pick once the
    window closes). Watermarks on BOTH sides are required for Spark to
    age out join state; the join condition's time bounds tell the
    engine exactly how long a click row can still match.

    ``how="left_outer"`` additionally emits each UNMATCHED purchase
    null-extended — the attribution-report form ("purchases with no
    prior touchpoint"). Outer results are inherently watermark-delayed:
    a purchase can only be declared click-less once the click-side
    watermark has passed its whole look-back interval, so rows flush on
    the trigger AFTER the watermark moves — streaming-correct behavior,
    pinned by the test.
    """
    p = purchases.withWatermark("ts", lateness).select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_event_id"),
    )
    c = clicks.withWatermark("ts", lateness).select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_event_id"),
    )
    return p.join(
        c,
        F.expr(
            f"""
            p_user_id = c_user_id AND
            click_ts <= purchase_ts AND
            click_ts >= purchase_ts - INTERVAL {max_gap}
            """
        ),
        how,
    ).select(
        F.col("p_user_id").alias("user_id"),
        "purchase_event_id",
        "purchase_ts",
        "click_event_id",
        "click_ts",
    )
