"""Event-time windowed aggregation with watermarking.

The reference delegates all time-bucketed analytics to its Mongo
time-series collection (SURVEY.md §2.9 last row: hours granularity at
the sink, db.py:46-53). The engine-native realization aggregates in
Spark itself: event-time tumbling windows with a watermark bounding
state and admitting bounded late data — the missing member of the §2.9
feature map (the session kernel covers custom stateful processing;
this covers declarative windowed aggregation).

Scale: the windowed agg is a standard partial-aggregated shuffle on
(window, keys); the watermark caps state at (watermark horizon /
window length) windows per key, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_counts(
    events: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (hour, event_type) counts and value sums over an event stream.

    Late events within ``watermark`` still update their window; older
    ones are dropped and the window's state is finalized — the
    declarative replacement for the sink-side bucketing the reference
    leaned on.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def hopping_event_counts(
    events: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Sliding-window counts/sums over an event stream: ``window``-long
    windows advancing every ``slide`` — each event lands in
    window/slide overlapping windows. The smoothing shape rate
    monitors use where tumbling buckets alias; the batch twin is
    q_events_hopping_window.

    Scale: the expansion into window/slide rows happens map-side before
    the partial aggregation, so the shuffle carries one partial per
    (task, window) — and the watermark still caps live state at
    (horizon / slide) windows per key.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "total_cents"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_cents",
        )
    )


def dedup_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact deduplication — the streaming member of the dedup
    family (operators/dedup.py holds the batch members): at-least-once
    sources (replayed payloads, retried producers) become exactly-once
    by key within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and expires
    a key's state once the watermark passes its last-seen time — state
    is bounded by keys-per-horizon, not stream length (a plain
    dropDuplicates on a stream would grow state forever).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )


def run_hourly_rollup(
    events_stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    processing_time: str | None = None,
):
    """Append-mode hourly rollup to parquet: a window's row is emitted
    once, when the watermark passes its end (finalized aggregates, the
    semantics a time-series store gives you per bucket).

    ``processing_time`` selects a periodic trigger; default is
    availableNow (drain and stop). Note availableNow can coalesce all
    pending files into one batch, which also collapses watermark
    advancement — tests that depend on per-batch watermark progression
    use the periodic trigger.
    """
    rollup = hourly_event_counts(events_stream, watermark)
    writer = (
        rollup.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session aggregates via the native ``session_window`` —
    the STREAMING twin of the batch q_events_session_window query (same
    call shape, same strict-merge boundary semantics): overlapping
    [ts, ts+gap) windows merge per user; the watermark both admits
    bounded late events into a still-open session and finalizes a
    session once no on-time event can extend it.

    Scale: state per (user, open session) only — merged windows
    collapse to one state row, and finalized sessions leave the store;
    state is bounded by concurrently-active users, not stream length.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id", F.session_window(F.col(ts_col), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def run_session_rollup(
    events_stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    processing_time: str | None = None,
):
    """Append-mode session rollup to parquet: each session emitted once,
    when the watermark guarantees nothing can extend or merge it."""
    rollup = session_counts(events_stream, gap=gap, watermark=watermark)
    writer = (
        rollup.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_with_dimension(
    events: DataFrame,
    dimension: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a live event stream with a batch
    dimension table — the third member of the streaming join family
    (stateful stream-stream: click_purchase_attribution; stateless
    stream-static: this; batch-batch: the relational surface).

    Stream-static joins are STATELESS on the stream side. Refresh
    semantics depend on the static source: a plain parquet dimension
    pins its FILE LISTING at query start (an overwrite mid-query breaks
    the run — batch jobs re-read files, not the listing), so the daily
    metadata_etl pattern is: refresh the dimension, then (re)start the
    enrichment query — trigger(availableNow) runs are restarts by
    construction, which the test exploits. A catalog table (REFRESH
    TABLE) or a snapshot-isolated format lifts that to per-batch
    freshness with the same join code. Spark broadcasts the dimension
    when it fits (same planner rules as batch); only inner and left
    joins preserve streaming semantics on the stream side.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"stream-static join supports inner/left on the stream side, "
            f"not {how!r} (right/full would need unmatched-dimension "
            "tracking across batches)"
        )
    return events.join(dimension, on=on, how=how)


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: every (click, purchase)
    pair for the same user with the click inside ``horizon`` before the
    purchase — streaming attribution, the stream-stream member of the
    join family (the batch member is operators/events.py's bucketized
    ``range_join_bucketed``; semantics coincide, and the same code runs
    on static frames where the watermarks are no-ops, which is what the
    batch-equivalence test exploits).

    Scale: Spark keeps both sides' state keyed by user; the time-bound
    join condition plus both watermarks let the state store EVICT rows
    once they can no longer match (clicks after watermark + horizon,
    purchases after watermark) — without the interval bounds the state
    would grow with the stream. Append mode: pairs emit once both sides
    pass the watermark.
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    pairs = p.join(
        c,
        F.expr(
            f"""user_id = p_user_id
            AND click_ts >= purchase_ts - INTERVAL {horizon}
            AND click_ts <= purchase_ts"""
        ),
        "inner",
    )
    return pairs.select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts",
        "purchase_value",
    )


def purchase_attribution_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Left-outer watermarked stream-stream join: EVERY purchase emits —
    paired with each in-horizon click when one exists, with null click
    columns otherwise. The outer member of the streaming join family:
    attribution reports need the unconverted-purchase rows (organic
    sales) as much as the converted ones.

    Semantics at scale: Spark buffers the preserved (purchase) side in
    the state store until the watermark proves no matching click can
    still arrive — only then does the null-padded row emit. So outer
    results trail the watermark by design; the same code on static
    frames is a plain left join, which the batch-equivalence test
    exploits. State on both sides is evicted by the time bound exactly
    as in the inner variant.
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    pairs = p.join(
        c,
        F.expr(
            f"""user_id = p_user_id
            AND click_ts >= purchase_ts - INTERVAL {horizon}
            AND click_ts <= purchase_ts"""
        ),
        "leftOuter",
    )
    return pairs.select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def ewma_stream(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Streaming twin of ``operators.events.ewma``: per-user adjust-free
    exponential smoothing ((1-a)*prev + a*x) as keyed running state —
    every event is emitted immediately with its smoothed value, and the
    single carried double survives micro-batch boundaries in the state
    store (contrast the batch twin, which re-sorts a partition per run).

    Equivalence contract (proven in tests/test_events_stream.py): for
    any split of a per-key-ordered event log into micro-batches, the
    streamed ewma values equal the batch operator's. Events are folded
    in (ts, event_id) order WITHIN a batch, so only cross-batch
    disorder breaks equivalence — the same in-order-source caveat as
    every running-state stream; put a watermarked sort (or the batch
    twin) in front of an out-of-order feed.

    Scale: state is one double per user; emission is append-mode, so
    sinks see each event exactly once.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    one_minus = 1.0 - alpha
    out_schema = (
        "user_id long, ts timestamp, event_id long, value double, "
        "ewma double"
    )

    def _update(key, pdf_iter, state: "GroupState"):
        import pandas as pd

        frames = [p for p in pdf_iter if not p.empty]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values(["ts", "event_id"], kind="mergesort")
        has_last = state.exists
        last = state.get[0] if has_last else 0.0
        vals = pdf["value"].to_numpy(dtype="float64")
        out = vals.copy()
        for i in range(len(out)):
            if has_last:
                out[i] = one_minus * last + alpha * vals[i]
            has_last, last = True, out[i]
        state.update((float(last),))
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "ts": pdf["ts"],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "ewma": out,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType="last double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
