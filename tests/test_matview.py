"""MaterializedJoinView: delta maintenance equals full recompute.

The invariant under test is the bilinear identity — after ANY
interleaving of fact upserts, fact deletes, and dim updates, the
incrementally maintained view equals the from-scratch join of the
final fact and dim states.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.matview import MaterializedJoinView


def _collect(view):
    return {
        (r.booking_id, r.customer_id, r.amount, r.tier)
        for r in view.read().collect()
    }


def test_matview_fact_and_dim_deltas(spark, tmp_path):
    fact0 = spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 200.0), (3, 30, 300.0)],
        "booking_id long, customer_id long, amount double",
    )
    dim0 = spark.createDataFrame(
        [(10, "bronze"), (20, "silver")], "customer_id long, tier string"
    )
    view = MaterializedJoinView(
        spark, str(tmp_path / "mv"), ["booking_id"], "customer_id"
    )
    view.full_build(fact0, dim0)
    assert _collect(view) == {
        (1, 10, 100.0, "bronze"),
        (2, 20, 200.0, "silver"),
        (3, 30, 300.0, None),  # no dim row: left join keeps the fact
    }

    # fact delta: new booking + changed amount on an existing one
    delta_f = spark.createDataFrame(
        [(2, 20, 250.0), (4, 10, 400.0)],
        "booking_id long, customer_id long, amount double",
    )
    view.apply_fact_delta(delta_f, dim0)
    assert _collect(view) == {
        (1, 10, 100.0, "bronze"),
        (2, 20, 250.0, "silver"),
        (3, 30, 300.0, None),
        (4, 10, 400.0, "bronze"),
    }

    # dim delta: tier change for customer 10 touches bookings 1 and 4
    # only; the late-arriving dim row for 30 back-fills booking 3
    fact_now = spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 250.0), (3, 30, 300.0), (4, 10, 400.0)],
        "booking_id long, customer_id long, amount double",
    )
    delta_d = spark.createDataFrame(
        [(10, "gold"), (30, "bronze")], "customer_id long, tier string"
    )
    view.apply_dim_delta(fact_now, delta_d)
    assert _collect(view) == {
        (1, 10, 100.0, "gold"),
        (2, 20, 250.0, "silver"),
        (3, 30, 300.0, "bronze"),
        (4, 10, 400.0, "gold"),
    }

    # fact delete
    view.apply_fact_deletes(spark.createDataFrame([(3,)], "booking_id long"))
    assert _collect(view) == {
        (1, 10, 100.0, "gold"),
        (2, 20, 250.0, "silver"),
        (4, 10, 400.0, "gold"),
    }


def test_matview_dim_delete_unenriches(spark, tmp_path):
    """A DELETED dim key has no post-image row in the delta, so its
    fact rows must be re-enriched via the explicit ``keys`` set — the
    left join then yields NULL, un-matching them (the stale pre-image
    tier must NOT survive in the view)."""
    fact = spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 200.0)],
        "booking_id long, customer_id long, amount double",
    )
    dim0 = spark.createDataFrame(
        [(10, "bronze"), (20, "silver")], "customer_id long, tier string"
    )
    view = MaterializedJoinView(
        spark, str(tmp_path / "mv"), ["booking_id"], "customer_id"
    )
    view.full_build(fact, dim0)

    # customer 10 deleted, customer 20 upgraded — one combined wave:
    # the delta carries only 20's post-image, keys carries both.
    delta = spark.createDataFrame([(20, "gold")], "customer_id long, tier string")
    keys = spark.createDataFrame([(10,), (20,)], "customer_id long")
    view.apply_dim_delta(fact, delta, keys=keys)
    assert _collect(view) == {
        (1, 10, 100.0, None),  # un-enriched, not stale "bronze"
        (2, 20, 200.0, "gold"),
    }


@settings(max_examples=5, deadline=None)
@given(
    ops=st.lists(
        st.one_of(
            # fact upsert: (0, booking_id, customer_id, amount-int)
            st.tuples(st.just(0), st.integers(0, 5), st.integers(0, 3), st.integers(0, 99)),
            # dim upsert: (1, customer_id, tier-int)
            st.tuples(st.just(1), st.integers(0, 3), st.integers(0, 9)),
            # fact delete: (2, booking_id)
            st.tuples(st.just(2), st.integers(0, 5)),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_matview_random_interleaving(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("mvrand")
    view = MaterializedJoinView(
        spark, str(tmp / "mv"), ["booking_id"], "customer_id", num_buckets=4
    )
    fact_state: dict[int, tuple[int, float]] = {}
    dim_state: dict[int, str] = {}
    view.full_build(
        spark.createDataFrame([], "booking_id long, customer_id long, amount double"),
        spark.createDataFrame([], "customer_id long, tier string"),
    )
    for op in ops:
        if op[0] == 0:
            _, bid, cid, amt = op
            fact_state[bid] = (cid, float(amt))
            view.apply_fact_delta(
                spark.createDataFrame(
                    [(bid, cid, float(amt))],
                    "booking_id long, customer_id long, amount double",
                ),
                spark.createDataFrame(
                    list(dim_state.items()) or [],
                    "customer_id long, tier string",
                ),
            )
        elif op[0] == 1:
            _, cid, tier = op
            dim_state[cid] = f"t{tier}"
            fact_now = spark.createDataFrame(
                [(b, c, a) for b, (c, a) in fact_state.items()] or [],
                "booking_id long, customer_id long, amount double",
            )
            view.apply_dim_delta(
                fact_now,
                spark.createDataFrame(
                    [(cid, f"t{tier}")], "customer_id long, tier string"
                ),
            )
        else:
            _, bid = op
            fact_state.pop(bid, None)
            view.apply_fact_deletes(
                spark.createDataFrame([(bid,)], "booking_id long")
            )
    expected = {
        (b, c, a, dim_state.get(c)) for b, (c, a) in fact_state.items()
    }
    assert _collect(view) == expected


def test_matview_streaming_fact_feed(spark, tmp_path):
    """Production shape: a streaming CDC feed drives the view's
    fact-delta path through foreachBatch — the same maintenance code,
    exactly-once per micro-batch via the idempotent keyed merge, and
    version-based last-writer-wins makes the result independent of the
    file source's batch ordering (micro-batch order is an
    implementation detail, not a guarantee)."""
    import json

    from pyspark.sql import types as T

    feed = tmp_path / "feed"
    feed.mkdir()
    batches = [
        [(1, 10, 100.0, 1), (2, 20, 200.0, 1)],
        [(2, 20, 250.0, 2), (3, 10, 300.0, 2)],  # update + insert
    ]
    for i, rows in enumerate(batches):
        with open(feed / f"b{i}.json", "w") as f:
            for bid, cid, amt, ver in rows:
                f.write(
                    json.dumps(
                        {
                            "booking_id": bid,
                            "customer_id": cid,
                            "amount": amt,
                            "updated_at": ver,
                        }
                    )
                    + "\n"
                )
    dim = spark.createDataFrame(
        [(10, "bronze"), (20, "silver")], "customer_id long, tier string"
    )
    view = MaterializedJoinView(
        spark,
        str(tmp_path / "mv_s"),
        ["booking_id"],
        "customer_id",
        version_col="updated_at",
        num_buckets=4,
    )
    schema = T.StructType(
        [
            T.StructField("booking_id", T.LongType()),
            T.StructField("customer_id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("updated_at", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(feed))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, _bid: view.apply_fact_delta(batch_df, dim)
        )
        .option("checkpointLocation", str(tmp_path / "mv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.booking_id, r.customer_id, r.amount, r.tier)
        for r in view.read().collect()
    }
    assert got == {
        (1, 10, 100.0, "bronze"),
        (2, 20, 250.0, "silver"),
        (3, 10, 300.0, "bronze"),
    }
