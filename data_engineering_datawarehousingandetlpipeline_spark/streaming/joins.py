"""Stream-stream joins: watermarked event-time interval joins.

The reference's pipeline never joins two live streams (its consumer loop
handles ONE topic, ``kafka_stream.py``); any correlation between feeds
happens after landing, in warehouse SQL. At 100 TB/day that pattern
re-scans the fact table per question. Structured Streaming's
stream-stream join answers the correlation ON the stream with bounded
state:

- both sides carry ``withWatermark`` so the state store can evict rows
  that can no longer match (inner join: evict when the other side's
  watermark passes ``ts + horizon``; outer join: additionally emit the
  accumulated NULL-padded non-matches),
- the join condition is an equi-key plus an event-time INTERVAL, which is
  what lets the engine reason about state eviction at all — a pure
  inequality join would keep unbounded state,
- state size is O(events inside the horizon + watermark delay) per key,
  independent of stream history.

:func:`attribution_join` is the canonical instance: purchases attributed
to the clicks that preceded them within a horizon (the ad-attribution /
conversion-funnel shape). The same construction serves any
"A happened within T of B" correlation (fraud co-occurrence, sensor
cross-validation, order/shipment reconciliation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default attribution horizon: a click converts if a purchase follows
#: within one hour.
DEFAULT_HORIZON_SECONDS = 3600


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left_outer",
) -> DataFrame:
    """Stream-static dimension enrichment: the everyday streaming join.

    The static side is a plain batch DataFrame — Spark re-evaluates it
    per micro-batch (so a dim backed by a warehouse table picks up
    slowly-changing updates between batches) and the broadcast hint
    keeps the join stateless and shuffle-free: no watermark, no state
    store, each event row leaves the batch it arrived in. LEFT OUTER by
    default — an event whose key is missing from the dimension must
    survive with NULLs, not vanish (the silent-row-loss failure mode of
    an inner enrichment against a lagging dim). For dims too big to
    broadcast, drop the hint and pre-bucket both sides instead; the
    semantics here don't change.
    """
    return stream.join(F.broadcast(dim), keys, how)


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_seconds: int = DEFAULT_HORIZON_SECONDS,
    watermark_seconds: int = 0,
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on user within an event-time horizon.

    Each ``purchases`` row matches every ``clicks`` row of the same user
    with ``click_ts ∈ [purchase_ts − horizon, purchase_ts]``. Output is
    one row per (purchase, click) pair::

        purchase_id, user_id, purchase_ts, click_id, click_ts, gap_us

    ``gap_us`` is the integral microsecond lag (purchase − click), so the
    value is exact on every engine — no double arithmetic.

    Watermarks bound the join state: a click can be evicted once the
    purchase-side watermark passes ``click_ts + horizon``. With
    ``watermark_seconds=0`` (ordered replays / drains) state still clears
    batch-over-batch; give out-of-order sources a real delay — rows older
    than the watermark on arrival are DROPPED, exactly the
    :func:`windowed_stats` late-data contract.

    ``how='left_outer'`` additionally emits unconverted purchases (NULL
    click columns) once the watermark proves no click can still arrive —
    the funnel-drop-off feed. Outer rows only emit when the watermark
    passes them, so a drain's final open tail stays in state (same
    append-mode contract as ``stateful_sessions``).

    Both inputs may be views of ONE source stream — Spark instantiates
    each side independently, so self-correlation needs no second topic.
    """
    c = (
        clicks.withWatermark("ts", f"{watermark_seconds} seconds")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", f"{watermark_seconds} seconds")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = p.join(
        c,
        (p["user_id"] == c["c_user_id"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (
            c["click_ts"]
            >= p["purchase_ts"] - F.expr(f"INTERVAL {horizon_seconds} SECONDS")
        ),
        how,
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )
