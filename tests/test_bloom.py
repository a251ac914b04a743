"""Distributed Bloom filter (operators/bloom.py): the no-false-
negative contract, measured false-positive rate, bit_or mergeability
(the property that makes it a lake sidecar), NULL-key semantics, and
the zero-exchange probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.operators import bloom


def _keys(spark, lo, hi, name="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("key-"), F.col("id")).alias(name)
    )


def test_no_false_negatives(spark):
    """Every inserted key MUST probe maybe_seen=true — the guarantee
    the admission fast path rests on (a false negative would admit a
    duplicate without the exact check)."""
    inserted = _keys(spark, 0, 500)
    filt = bloom.bloom_build(inserted, "k").localCheckpoint()
    probed = bloom.bloom_probe(inserted, filt, "k")
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_bounded(spark):
    """Fresh keys: at 500 inserted keys / 2^24 bits the fill is
    ~0.012%, so fpp ≈ fill^4 is astronomically small — assert the
    loose engineering bound (< 1%) that holds even at much higher
    fills."""
    filt = bloom.bloom_build(_keys(spark, 0, 500), "k").localCheckpoint()
    fresh = _keys(spark, 1_000_000, 1_005_000)
    fp = bloom.bloom_probe(fresh, filt, "k").filter(F.col("maybe_seen")).count()
    assert fp / 5000 < 0.01, fp


def test_merge_equals_joint_build(spark):
    """bit_or mergeability: build(A ∪ B) == merge(build(A), build(B))
    word-for-word — batch filters fold into the lake sidecar without
    rescanning history."""
    a, b = _keys(spark, 0, 300), _keys(spark, 200, 600)  # overlapping
    joint = bloom.bloom_build(a.unionByName(b), "k")
    merged = bloom.bloom_merge(
        bloom.bloom_build(a, "k"), bloom.bloom_build(b, "k")
    )
    as_rows = lambda df: sorted(
        (r["word_idx"], r["word"]) for r in df.collect()
    )
    assert as_rows(joint) == as_rows(merged)
    # idempotent: merging a filter with itself is a no-op
    assert as_rows(bloom.bloom_merge(joint, joint)) == as_rows(joint)


def test_null_keys_dropped_and_probe_false(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "k string"
    )
    filt = bloom.bloom_build(df, "k").localCheckpoint()
    # NULL contributes no bits
    n_words_nonnull = bloom.bloom_build(
        df.filter(F.col("k").isNotNull()), "k"
    ).count()
    assert filt.count() == n_words_nonnull
    probed = {
        r["k"]: r["maybe_seen"] for r in bloom.bloom_probe(df, filt, "k").collect()
    }
    assert probed["a"] and probed["b"]
    assert probed[None] is False


def test_probe_plan_has_no_batch_exchange(spark):
    """The probe is k broadcast joins + map-side bit tests: the batch
    side must take NO shuffle exchange, so the pre-filter composes
    into admission without repartitioning the batch."""
    filt = bloom.bloom_build(_keys(spark, 0, 100), "k").localCheckpoint()
    probed = bloom.bloom_probe(_keys(spark, 0, 100), filt, "k")
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning" not in plan, plan


def test_fill_stats(spark):
    inserted = _keys(spark, 0, 500)
    filt = bloom.bloom_build(inserted, "k")
    row = bloom.bloom_fill_stats(filt).collect()[0]
    # ≤ k·n bits (strictly fewer on collisions), tiny fill
    assert 0 < row["bits_set"] <= 4 * 500
    assert row["words_nonzero"] <= row["bits_set"]
    assert row["fill_frac"] < 0.001


def test_grouped_build_is_per_group(spark):
    """group_cols: one independent filter per group — a key inserted
    under group A must not set bits in group B's filter."""
    df = spark.createDataFrame(
        [("en", "k1"), ("fr", "k2")], "lang string, k string"
    )
    filt = bloom.bloom_build(df, "k", group_cols=("lang",))
    en = filt.filter(F.col("lang") == "en").drop("lang")
    # k2 was never inserted into the en filter
    probed = {
        r["k"]: r["maybe_seen"]
        for r in bloom.bloom_probe(
            spark.createDataFrame([("k1",), ("k2",)], "k string"), en, "k"
        ).collect()
    }
    assert probed["k1"] is True
    assert probed["k2"] is False


def test_stream_probe_matches_broadcast(spark):
    """r15: the streamed probe shape (filter scanned map-side against
    broadcast batch positions — the grown-geometry path) is verdict-
    identical to the broadcast shape on members, non-members, NULLs,
    and duplicate batch keys, at both a small and a grown geometry;
    auto mode picks broadcast at the default geometry and stream
    above it."""
    inserted = _keys(spark, 0, 400)
    batch = (
        _keys(spark, 300, 500)          # 100 members + 100 fresh
        .unionByName(_keys(spark, 300, 350))  # duplicate keys
        .unionByName(
            spark.range(1).select(F.lit(None).cast("string").alias("k"))
        )
        .withColumn("payload", F.concat(F.lit("p-"), F.col("k")))
    )
    for hex_chars in (6, 7):
        filt = bloom.bloom_build(
            inserted, "k", hex_chars=hex_chars
        ).localCheckpoint()

        def verdicts(mode):
            rows = bloom.bloom_probe(
                batch, filt, "k", hex_chars=hex_chars, mode=mode
            ).collect()
            # all batch columns ride through both shapes
            assert {r["payload"] for r in rows} == {
                f"p-key-{i}" for i in range(300, 500)
            } | {None}
            return sorted(
                ((r["k"], r["maybe_seen"]) for r in rows),
                key=lambda t: (t[0] is None, t[0] or "", t[1]),
            )

        b, s = verdicts("broadcast"), verdicts("stream")
        assert b == s
        # members all maybe, NULL always false (shared contract)
        by_key = dict(b)
        assert by_key[None] is False
        assert all(by_key[f"key-{i}"] for i in range(300, 400))


def test_stream_probe_never_broadcasts_filter(spark):
    """The streamed shape's 100 TB contract: the FILTER side is
    scanned, not broadcast-built — only batch-sized frames (positions,
    maybe-keys) broadcast."""
    inserted = _keys(spark, 0, 2000)
    filt = bloom.bloom_build(inserted, "k", hex_chars=7).localCheckpoint()
    probed = bloom.bloom_probe(_keys(spark, 0, 10), filt, "k",
                               hex_chars=7, mode="stream")
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # no SMJ/shuffled join anywhere; every join is a BroadcastHashJoin
    # whose build side is batch-derived
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan
