"""Streaming windowed aggregation with watermark (beyond-reference
streaming surface) + skew utilities."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbnb_cdc_spark.operators.skew import salted_agg, salted_join
from airbnb_cdc_spark.operators.windowed import tumbling_event_agg

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_streaming_tumbling_window_with_watermark(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    t0 = datetime(2025, 1, 1, 0, 30)
    rows = []
    for i in range(48):
        rows.append(
            {
                "event_id": i,
                "ts": (t0 + timedelta(hours=i)).isoformat(sep=" "),
                "user_id": i % 5,
                "event_type": "click" if i % 2 == 0 else "view",
                "value": 10.0,
            }
        )
    with open(feed / "events.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(feed))
    agg = tumbling_event_agg(stream, watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("win_agg")
    # append mode emits only watermark-closed windows: day 1 (24 events,
    # 12 click + 12 view), day 2 still open at end of input
    rows_out = {(r.window_start.day, r.event_type): r for r in out.collect()}
    assert (1, "click") in rows_out and (1, "view") in rows_out
    assert rows_out[(1, "click")].n_events == 12
    assert rows_out[(1, "click")].total_value == 120.0
    assert rows_out[(1, "view")].distinct_users == 5


def test_streaming_hopping_window_with_watermark(spark, tmp_path):
    """Hopping windows streaming: each event lands in 2 overlapping
    1h/30min windows; append mode emits watermark-closed windows."""
    from airbnb_cdc_spark.operators.windowed import hopping_event_agg

    feed = tmp_path / "hop_feed"
    feed.mkdir()
    t0 = datetime(2025, 1, 1, 0, 15)
    rows = [
        {
            "event_id": i,
            "ts": (t0 + timedelta(minutes=30 * i)).isoformat(sep=" "),
            "user_id": i,
            "event_type": "click",
            "value": 10.0,
        }
        for i in range(12)
    ]
    with open(feed / "events.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(feed))
    agg = hopping_event_agg(stream, watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("hop_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hop_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {r.window_start: r for r in spark.table("hop_agg").collect()}
    # event at 00:15 belongs to windows starting 23:30 and 00:00; a
    # fully-interior window (00:00-01:00) holds the 00:15 and 00:45
    # events
    w = datetime(2025, 1, 1, 0, 0)
    assert w in out and out[w].n_events == 2 and out[w].total_value == 20.0
    # every emitted window holds at most duration/slide * 1-per-slot = 2
    assert all(r.n_events <= 2 for r in out.values())


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [Row(k="hot", v=float(i)) for i in range(1000)]
        + [Row(k="cold", v=1.0), Row(k="cold", v=2.0)]
    )
    out = {
        r.k: r
        for r in salted_agg(
            df,
            ["k"],
            {"total": ("v", "sum"), "n": ("v", "count"), "mx": ("v", "max")},
            n_salts=8,
        ).collect()
    }
    assert out["hot"].total == sum(range(1000)) and out["hot"].n == 1000
    assert out["cold"].total == 3.0 and out["cold"].mx == 2.0


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [Row(k="a", v=i) for i in range(500)] + [Row(k="b", v=i) for i in range(3)]
    )
    small = spark.createDataFrame([Row(k="a", name="alpha"), Row(k="b", name="beta")])
    plain = big.join(small, "k").groupBy("k", "name").count()
    salted = salted_join(big, small, ["k"], n_salts=4).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_stateful_streaming_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions closed by a later
    batch's events (gap exceeded) are emitted with correct bounds."""
    from airbnb_cdc_spark.operators.sessionize import sessionize_stream

    feed = tmp_path / "feed"
    feed.mkdir()
    t0 = datetime(2025, 3, 1, 10, 0)
    # user 1: two bursts 2h apart (gap 30m → two sessions); user 2: one burst
    batch = []
    for m in (0, 5, 10):
        batch.append({"event_id": m, "ts": (t0 + timedelta(minutes=m)).isoformat(sep=" "),
                      "user_id": 1, "event_type": "click", "value": 1.0})
    for m in (120, 125):
        batch.append({"event_id": 100 + m, "ts": (t0 + timedelta(minutes=m)).isoformat(sep=" "),
                      "user_id": 1, "event_type": "click", "value": 1.0})
    batch.append({"event_id": 999, "ts": (t0 + timedelta(minutes=1)).isoformat(sep=" "),
                  "user_id": 2, "event_type": "view", "value": 1.0})
    with open(feed / "b0.json", "w") as f:
        for r in batch:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(feed))
    sessions = sessionize_stream(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # Processing-time timeouts keep the query alive waiting for future
    # gap expirations — bound the wait, then stop.
    import time

    deadline = time.time() + 90
    while time.time() < deadline and spark.table("sessions_out").count() == 0:
        time.sleep(1)
    q.stop()
    out = spark.table("sessions_out").collect()
    # user 1's first burst was closed by the second burst within the batch
    assert len(out) == 1
    s = out[0]
    assert s.user_id == 1 and s.n_events == 3
    assert s.session_start == t0 and s.session_end == t0 + timedelta(minutes=10)


def test_stream_stream_interval_join(spark, tmp_path):
    """attribute_purchases as a watermarked stream-stream join: purchases
    match views of the same user within the horizon, state bounded."""
    import json as _json

    from airbnb_cdc_spark.operators.windowed import attribute_purchases

    feed = tmp_path / "feed"
    feed.mkdir()
    t0 = datetime(2025, 4, 1, 12, 0)
    rows = [
        # user 1: view at 0, purchase at 10 (match) and at 45 (outside 30m)
        {"event_id": 1, "ts": t0, "user_id": 1, "event_type": "view", "value": 1.0},
        {"event_id": 2, "ts": t0 + timedelta(minutes=10), "user_id": 1,
         "event_type": "purchase", "value": 5.0},
        {"event_id": 3, "ts": t0 + timedelta(minutes=45), "user_id": 1,
         "event_type": "purchase", "value": 7.0},
        # user 2: purchase with no prior view
        {"event_id": 4, "ts": t0 + timedelta(minutes=5), "user_id": 2,
         "event_type": "purchase", "value": 3.0},
        # watermark pusher so the joinable window closes
        {"event_id": 9, "ts": t0 + timedelta(hours=4), "user_id": 9,
         "event_type": "view", "value": 0.0},
    ]
    with open(feed / "b0.json", "w") as f:
        for r in rows:
            f.write(_json.dumps({**r, "ts": r["ts"].isoformat(sep=" ")}) + "\n")

    def stream():
        return spark.readStream.schema(EVENT_SCHEMA).json(str(feed))

    views = stream().filter("event_type = 'view'").withWatermark("ts", "1 hour")
    purchases = stream().filter("event_type = 'purchase'").withWatermark("ts", "1 hour")
    joined = attribute_purchases(views, purchases, horizon_minutes=30)
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = [(r.view_event_id, r.purchase_event_id) for r in spark.table("attrib_out").collect()]
    assert out == [(1, 2)]  # only the in-horizon pair


def test_streaming_agg_upsert_into_merge_table(spark, tmp_path):
    """Windowed agg maintained incrementally in a keyed merge table via
    foreachBatch (update mode): late-arriving events re-emit their
    window, and the merge upserts the refreshed row in place."""
    import json as _json

    from airbnb_cdc_spark.operators.merge import ParquetMergeTable
    from airbnb_cdc_spark.operators.windowed import tumbling_event_agg

    feed = tmp_path / "feed"
    feed.mkdir()
    t0 = datetime(2025, 5, 1, 0, 0)

    def write_batch(name, rows, age):
        import os
        import time

        with open(feed / name, "w") as f:
            for r in rows:
                f.write(_json.dumps({**r, "ts": r["ts"].isoformat(sep=" ")}) + "\n")
        now = time.time()
        os.utime(feed / name, (now - age, now - age))

    write_batch(
        "b0.json",
        [
            {"event_id": 1, "ts": t0 + timedelta(hours=1), "user_id": 1,
             "event_type": "click", "value": 10.0},
            {"event_id": 2, "ts": t0 + timedelta(hours=2), "user_id": 2,
             "event_type": "click", "value": 20.0},
        ],
        age=60,
    )
    # a later batch adds one more click to the SAME day-window
    write_batch(
        "b1.json",
        [
            {"event_id": 3, "ts": t0 + timedelta(hours=3), "user_id": 3,
             "event_type": "click", "value": 5.0}
        ],
        age=0,
    )

    table = ParquetMergeTable(
        spark, str(tmp_path / "agg"), keys=["window_start", "event_type"]
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    agg = tumbling_event_agg(stream)  # no watermark: windows stay updatable

    def upsert(batch_df, _bid):
        table.merge(batch_df)

    q = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r.window_start, r.event_type): r for r in table.read().collect()}
    assert len(rows) == 1  # one day-window, one type — refreshed in place
    r = rows[(t0, "click")]
    assert r.n_events == 3 and r.total_value == 35.0


def test_stream_static_enrichment_lookup(spark, tmp_path):
    """Stream-static join: the SAME lookup_latest operator (O5) that
    serves the batch dataflow enriches a streaming feed against a
    static dimension — the production ingest-enrichment shape. The
    static side window-dedups to latest-per-key once; the broadcast
    hash join adds no stream-side shuffle and needs no watermark
    (stream-static joins are stateless)."""
    import json as _json

    from airbnb_cdc_spark.operators.lookup import lookup_latest

    feed = tmp_path / "enrich_feed"
    feed.mkdir()
    t0 = datetime(2025, 1, 1)
    rows = [
        {
            "event_id": i,
            "ts": (t0 + timedelta(minutes=i)).isoformat(sep=" "),
            "user_id": i % 3,
            "event_type": "click",
            "value": 1.0,
        }
        for i in range(6)
    ]
    with open(feed / "e.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")

    # dim with two versions for user 0: the v2 row must win; user 2
    # absent: NULL enrichment must pass through (left join)
    dim = spark.createDataFrame(
        [
            (0, "bronze", 1),
            (0, "gold", 2),
            (1, "silver", 1),
        ],
        "user_id long, tier string, version long",
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(feed))
    enriched = lookup_latest(
        stream, dim, keys=["user_id"], version_col="version", hint_broadcast=True
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_feed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "enrich_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("enriched_feed").collect()
    assert len(out) == 6
    tiers = {r.event_id: r.t_tier for r in out}
    assert tiers[0] == "gold" and tiers[3] == "gold"  # user 0, latest version
    assert tiers[1] == "silver" and tiers[4] == "silver"  # user 1
    assert tiers[2] is None and tiers[5] is None  # user 2: no dim row


def test_streaming_session_window_with_watermark(spark, tmp_path):
    """Engine session windows streaming: bursts separated by more than
    the gap become separate sessions; append mode emits sessions the
    watermark has closed. Pins the boundary rule: an event at EXACTLY
    prev + gap MERGES (split is strictly diff > gap — the same rule as
    sessionize_batch, and what the SQL oracle mirrors), while one
    microsecond beyond starts a new session."""
    from airbnb_cdc_spark.operators.windowed import session_window_agg

    feed = tmp_path / "sess_feed"
    feed.mkdir()
    t0 = datetime(2025, 1, 1, 0, 0)
    rows = []
    # user 0: burst of 3 within 10 min; a second burst 2h later whose
    # third event lands at EXACTLY last + 30min (merges); then one
    # event 1 microsecond beyond ITS gap (new session); a far-future
    # event advances the watermark past everything.
    deltas = [
        timedelta(minutes=0),
        timedelta(minutes=5),
        timedelta(minutes=10),
        timedelta(minutes=120),
        timedelta(minutes=125),
        timedelta(minutes=155),  # == 125min + gap -> merges
        timedelta(minutes=185, microseconds=1),  # > 155min + gap -> new
    ]
    for i, d in enumerate(deltas):
        rows.append(
            {
                "event_id": i,
                "ts": (t0 + d).isoformat(sep=" "),
                "user_id": 0,
                "event_type": "click",
                "value": 1.0,
            }
        )
    rows.append(
        {
            "event_id": 99,
            "ts": (t0 + timedelta(days=2)).isoformat(sep=" "),
            "user_id": 1,
            "event_type": "click",
            "value": 1.0,
        }
    )
    with open(feed / "events.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(feed))
    agg = session_window_agg(stream, gap="30 minutes", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start.hour, r.session_start.minute, r.n_events)
        for r in spark.table("sess_agg").collect()
    }
    # user 0: [00:00,00:05,00:10] one session; [02:00,02:05,02:35]
    # one session (02:35 == 02:05 + gap merges); 03:05:00.000001 is
    # strictly past 02:35 + gap -> its own session
    assert (0, 0, 0, 3) in got
    assert (0, 2, 0, 3) in got
    assert (0, 3, 5, 1) in got
    # batch leg over the same rows agrees with the streaming emission
    batch = session_window_agg(
        spark.createDataFrame(
            [
                Row(
                    event_id=r["event_id"],
                    ts=datetime.fromisoformat(r["ts"]),
                    user_id=r["user_id"],
                    event_type=r["event_type"],
                    value=r["value"],
                )
                for r in rows
            ],
            EVENT_SCHEMA,
        ),
        gap="30 minutes",
    )
    batch_got = {
        (r.user_id, r.session_start.hour, r.session_start.minute, r.n_events)
        for r in batch.collect()
    }
    assert got <= batch_got  # streaming emitted only closed sessions
    assert (0, 0, 0, 3) in batch_got and (0, 3, 5, 1) in batch_got
