"""Corpus-prep operators: deterministic sampling, mixing,
interleaving (operators/corpus_prep.py), PII scrub (operators/text.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.operators import corpus_prep as cp
from projet_big_data_boutin_danre_spark.operators import text as text_ops


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("fr"), F.lit("de"), F.lit("es")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )


def test_hex_threshold_edges():
    assert cp.hex_threshold(0.0) == "00000000"
    assert cp.hex_threshold(1.0) == "g"
    assert cp.hex_threshold(0.5) == "80000000"
    # every hex key sorts below "g", none below "00000000"
    assert "ffffffff" < "g" and not ("00000000" < "00000000")


def test_stratified_sample_deterministic_and_stratified(spark):
    docs = _docs(spark)
    fr = {"en": 1.0, "fr": 0.5, "de": 0.0}
    a = cp.stratified_sample(docs, "doc_id", "lang", fr, seed=7)
    b = cp.stratified_sample(docs, "doc_id", "lang", fr, seed=7)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    assert ids_a == sorted(r["doc_id"] for r in b.collect())  # pure fn
    by_lang = {
        r["lang"]: r["n"]
        for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("en") == 50          # fraction 1.0 keeps all
    assert by_lang.get("de") is None        # fraction 0.0 keeps none
    assert by_lang.get("es") is None        # default_fraction=0.0
    assert 10 <= by_lang.get("fr", 0) <= 40  # ~25 of 50 at p=.5


def test_stratified_sample_decisions_stable_under_growth(spark):
    """Incremental property: growing the table never flips an old
    row's keep/drop decision."""
    fr = {"en": 0.4, "fr": 0.4, "de": 0.4, "es": 0.4}
    small = cp.stratified_sample(_docs(spark, 100), "doc_id", "lang", fr)
    big = cp.stratified_sample(_docs(spark, 200), "doc_id", "lang", fr)
    kept_small = {r["doc_id"] for r in small.collect()}
    kept_big = {r["doc_id"] for r in big.collect()}
    assert kept_small == {i for i in kept_big if i < 100}


def test_domain_mix_exact_counts_and_determinism(spark):
    docs = _docs(spark)
    take = {"en": 7, "fr": 50, "es": 60}  # es over-asks (only 50 exist)
    out = cp.domain_mix(docs, "doc_id", "lang", take, seed=3)
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang == {"en": 7, "fr": 50, "es": 50}  # de absent → 0
    again = cp.domain_mix(docs, "doc_id", "lang", take, seed=3)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # a different seed takes a different subset of en
    other = cp.domain_mix(docs, "doc_id", "lang", take, seed=4)
    en = lambda df: {r["doc_id"] for r in df.filter(F.col("lang") == "en").collect()}
    assert en(out) != en(other)


def test_interleave_is_total_deterministic_permutation(spark):
    docs = _docs(spark, 300)
    got = [r["doc_id"] for r in cp.interleave(docs, "doc_id", seed=9).collect()]
    assert sorted(got) == list(range(300))            # permutation
    assert got != list(range(300))                    # actually shuffled
    again = [r["doc_id"] for r in cp.interleave(docs, "doc_id", seed=9).collect()]
    assert got == again
    # matches the key order computed independently
    keyed = docs.select(
        "doc_id", cp.sample_key("doc_id", 9).alias("k")
    ).collect()
    expect = [r["doc_id"] for r in sorted(keyed, key=lambda r: (r["k"], r["doc_id"]))]
    assert got == expect


def test_interleave_plan_is_range_partitioned_sort(spark):
    df = cp.interleave(_docs(spark, 300), "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Sort" in plan
    assert "rangepartitioning" in plan.lower()  # not a single reducer


def test_sample_summary_checksums(spark):
    docs = _docs(spark, 40)
    out = {
        r["lang"]: (r["n_kept"], r["sum_ids"])
        for r in cp.sample_summary(docs, "doc_id", "lang").collect()
    }
    assert out["en"] == (10, sum(range(0, 40, 4)))


def test_pii_scrub_goldens(spark):
    rows = [
        (0, "mail me at jane.doe+x@corp.example.com or at 10.0.0.1"),
        (1, "card 1234567890123 and short 12345678"),
        (2, "nested digits inside addr 123456789@host.org stay EMAIL"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in
           text_ops.pii_scrub(df, "doc_id", "text").collect()}
    assert (got[0]["n_emails"], got[0]["n_ips"], got[0]["n_long_nums"]) == (1, 1, 0)
    assert (got[1]["n_emails"], got[1]["n_long_nums"]) == (0, 1)  # 8 digits: kept
    # the 9-digit local part is consumed by the email redaction
    assert (got[2]["n_emails"], got[2]["n_long_nums"]) == (1, 0)
    assert got[3]["scrubbed_fp"] is None and got[3]["n_emails"] is None


def test_text_profile_pii_widening_matches_standalone(spark):
    docs = _docs(spark, 20).withColumn(
        "text", F.concat(F.col("text"), F.lit(" ping 192.168.0.1"))
    )
    wide = text_ops.text_profile(docs, "doc_id", "text", include_pii=True)
    scrub = text_ops.pii_scrub(docs, "doc_id", "text")
    assert set(scrub.columns) <= set(wide.columns)
    w = {r["doc_id"]: r for r in wide.collect()}
    for r in scrub.collect():
        assert r["n_ips"] == 1
        assert w[r["doc_id"]]["scrubbed_fp"] == r["scrubbed_fp"]


def test_domain_mix_prefilter_scale_path_exact(spark):
    """The pre-filtered mix (scale path) returns byte-identical rows
    to the full per-stratum sort when the pre-filter survives enough
    rows, and the underflow audit is empty."""
    docs = _docs(spark, 400)
    take = {"en": 10, "fr": 25}
    full = cp.domain_mix(docs, "doc_id", "lang", take, seed=5)
    # generous slack: ask ~10/100 and ~25/100, prefilter at 4x rate
    pre = cp.domain_mix(
        docs, "doc_id", "lang", take, seed=5,
        prefilter_fractions={"en": 0.4, "fr": 1.0},
    )
    key = lambda df: sorted((r["lang"], r["doc_id"]) for r in df.collect())
    assert key(full) == key(pre)
    assert cp.mix_underflow(pre, "lang", take).count() == 0


def test_domain_mix_prefilter_underflow_is_detected(spark):
    """Too-tight slack under-delivers but never delivers WRONG rows:
    the survivors are a prefix-consistent subset of the exact take."""
    docs = _docs(spark, 400)
    take = {"en": 90}  # ask for 90 of 100
    tight = cp.domain_mix(
        docs, "doc_id", "lang", take, seed=5,
        prefilter_fractions={"en": 0.3},  # survives ~30 ≪ 90
    )
    audit = cp.mix_underflow(tight, "lang", take).collect()
    assert len(audit) == 1 and audit[0]["n_got"] < 90
    exact = cp.domain_mix(docs, "doc_id", "lang", take, seed=5)
    got = {r["doc_id"] for r in tight.collect()}
    assert got <= {r["doc_id"] for r in exact.collect()}


def test_stratified_sample_is_streaming_safe(spark, tmp_path):
    """The sampler is a stateless narrow filter, so it runs unchanged
    under Structured Streaming and keeps EXACTLY the rows the batch
    plan keeps — deterministic sampling needs no state store."""
    docs = _docs(spark, 120)
    src = tmp_path / "sample_src"
    docs.coalesce(2).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    fr = {"en": 0.5, "fr": 0.25}
    q = (
        cp.stratified_sample(stream, "doc_id", "lang", fr, seed=11)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sample_stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["doc_id"]
        for r in spark.sql("SELECT * FROM sample_stream_out").collect()
    }
    want = {
        r["doc_id"]
        for r in cp.stratified_sample(docs, "doc_id", "lang", fr, seed=11).collect()
    }
    assert got == want and got


def test_write_training_shards_replays_global_order(spark, tmp_path):
    """Reading shards back ordered by (__shard, __key, id) replays the
    exact interleave order; shard membership is contiguous slices of
    the global order (every row in shard i sorts before every row in
    shard i+1)."""
    docs = _docs(spark, 500)
    path = str(tmp_path / "shards")
    cp.write_training_shards(docs, "doc_id", path, seed=21, n_shards=8)
    back = spark.read.parquet(path)
    assert back.count() == 500
    rows = [
        (r["__shard"], r["__key"], r["doc_id"])
        for r in back.select("__shard", "__key", "doc_id").collect()
    ]
    # contiguity: per-shard key ranges don't overlap
    by_shard = {}
    for sh, k, i in rows:
        by_shard.setdefault(sh, []).append((k, i))
    shard_ids = sorted(by_shard)
    for a, b in zip(shard_ids, shard_ids[1:]):
        assert max(by_shard[a]) <= min(by_shard[b])
    # replay: ordering by (shard, key, id) == the interleave order
    replay = [i for _, _, i in sorted(rows)]
    want = [
        r["doc_id"]
        for r in cp.interleave(docs, "doc_id", seed=21).collect()
    ]
    assert replay == want


def test_global_prefix_sum_matches_serial(spark):
    import random

    rng = random.Random(11)
    rows = [(i, rng.randrange(0, 50)) for i in range(1, 301)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "id long, v long")
    for n_parts in (1, 3, 8):
        out = {
            r.id: r.prefix_sum
            for r in cp.global_prefix_sum(
                df, "id", "v", n_parts=n_parts
            ).collect()
        }
        acc, expect = 0, {}
        for i, v in sorted(rows):
            acc += v
            expect[i] = acc
        # identical totals for ANY partition layout
        assert out == expect, f"n_parts={n_parts}"


def test_global_prefix_sum_excludes_null_keys(spark):
    df = spark.createDataFrame(
        [(1, 5), (None, 7), (2, 3)], "id long, v long"
    )
    out = {r.id: r.prefix_sum for r in cp.global_prefix_sum(df, "id", "v").collect()}
    assert out == {1: 5, 2: 8}


def test_pack_sequences_spans_and_bins(spark):
    rows = [(1, 300), (2, 300), (3, 0), (4, 500), (5, 24)]
    df = spark.createDataFrame(rows, "doc_id long, tk long")
    out = {
        r.doc_id: (r.pack_start, r.pack_end, r.bin_first, r.bin_last)
        for r in cp.pack_sequences(df, "doc_id", "tk", budget=512).collect()
    }
    # doc1 [0,300) bin 0; doc2 [300,600) straddles 0-1; doc3 empty at
    # 600 -> bin 1 only; doc4 [600,1100) bins 1-2; doc5 [1100,1124) bin 2
    assert out[1] == (0, 300, 0, 0)
    assert out[2] == (300, 600, 0, 1)
    assert out[3] == (600, 600, 1, 1)
    assert out[4] == (600, 1100, 1, 2)
    assert out[5] == (1100, 1124, 2, 2)
    with pytest.raises(ValueError, match="budget"):
        cp.pack_sequences(df, "doc_id", "tk", budget=0)


def test_global_prefix_sum_no_single_partition_exchange(spark):
    """The whole point vs a global orderBy window: the plan must not
    funnel the data through Exchange SinglePartition."""
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    out = cp.global_prefix_sum(df, "id", "v", n_parts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # the range-partitioned cumsum sits behind a localCheckpoint (the
    # partitioning must be pinned before its two consumer jobs), so
    # the visible plan is a checkpoint scan + broadcast offset join —
    # layout independence itself is pinned by
    # test_global_prefix_sum_matches_serial across n_parts
    assert "BroadcastHashJoin" in plan


def test_corpus_diff_classifies_membership_and_content(spark):
    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "Same   TEXT!"), (2, "has changed"), (4, "brand new")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.change for r in cp.corpus_diff(old, new, "doc_id", "text").collect()}
    # doc 1 normalizes identically -> unchanged -> absent
    assert out == {2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_null_text_membership(spark):
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "had text")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, None), (2, "now has text"), (3, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.change for r in cp.corpus_diff(old, new, "doc_id", "text").collect()}
    # doc 1: NULL text both sides -> unchanged (absent), NOT added
    # docs 2/3: present in both, content flipped NULL<->text -> changed
    assert out == {2: "changed", 3: "changed"}


def test_pack_sequences_single_and_exact_boundary(spark):
    # one doc exactly filling a bin, next doc starts bin 1 cleanly
    df = spark.createDataFrame(
        [(1, 512), (2, 512)], "doc_id long, tk long"
    )
    out = {
        r.doc_id: (r.pack_start, r.pack_end, r.bin_first, r.bin_last)
        for r in cp.pack_sequences(df, "doc_id", "tk", budget=512).collect()
    }
    assert out[1] == (0, 512, 0, 0)   # [0,512) stays inside bin 0
    assert out[2] == (512, 1024, 1, 1)


def test_global_prefix_sum_null_values_count_as_zero(spark):
    """NULL values must not NULL the running total: a window sum over
    an all-NULL prefix is NULL, so rows before the first non-NULL
    value would otherwise get NULL prefix sums."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, 5), (4, None), (5, 7)],
        "id long, v long",
    )
    out = {
        r.id: r.prefix_sum
        for r in cp.global_prefix_sum(df, "id", "v", n_parts=3).collect()
    }
    assert out == {1: 0, 2: 0, 3: 5, 4: 5, 5: 12}


def test_domain_mix_temperature_allocation_and_clip(spark):
    """α=0.5: quotas ∝ √n with integer-quantized weights; a stratum
    smaller than its quota is clipped (quota not redistributed)."""
    import math

    rows = [(i, "big") for i in range(400)]
    rows += [(1000 + i, "small") for i in range(100)]
    rows += [(2000 + i, "tiny") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = cp.domain_mix_temperature(
        df, "doc_id", "lang", total_out=100, alpha=0.5, seed=13
    )
    got = {r.lang: r.n_kept for r in cp.sample_summary(out, "doc_id", "lang").collect()}
    s = {g: math.floor(math.sqrt(n) * 1e6) for g, n in
         (("big", 400), ("small", 100), ("tiny", 4))}
    tot = sum(s.values())
    want = {g: min(n, (100 * s[g]) // tot) for g, n in
            (("big", 400), ("small", 100), ("tiny", 4))}
    assert got == {g: w for g, w in want.items() if w > 0}
    # √n reweighting up-weights small strata vs raw share
    assert got["small"] / 100 > got["big"] / 400
    # deterministic: re-run keeps identical ids
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in cp.domain_mix_temperature(
            df, "doc_id", "lang", total_out=100, alpha=0.5, seed=13
        ).collect()
    )
    assert ids1 == ids2


def test_domain_mix_temperature_alpha_one_is_proportional(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(300)] + [(1000 + i, "b") for i in range(100)],
        "doc_id long, lang string",
    )
    out = cp.domain_mix_temperature(
        df, "doc_id", "lang", total_out=40, alpha=1.0, seed=1
    )
    got = {r.lang: r.n_kept for r in cp.sample_summary(out, "doc_id", "lang").collect()}
    assert got == {"a": 30, "b": 10}


def test_token_budget_take_greedy_prefix(spark):
    """Keep while tokens-before < budget: overshoot is at most the
    crossing doc; NULL token counts cost 0; per-stratum budgets are
    independent."""
    df = spark.createDataFrame(
        [(1, "a", 50), (2, "a", 50), (3, "a", 50), (4, "a", None),
         (5, "b", 500), (6, "b", 1)],
        "doc_id long, lang string, tok int",
    )
    out = cp.token_budget_take(df, "doc_id", "lang", "tok", budget=100, seed=11)
    kept = {r.doc_id for r in out.collect()}
    # stratum a: hash order of (1,2,3,4); cumulative-before of the
    # kept set must all be < 100 -> exactly the first 2 non-null-cost
    # docs after any zero-cost ones
    ordered = [
        r.doc_id
        for r in df.filter(F.col("lang") == "a")
        .orderBy(cp.sample_key("doc_id", 11), "doc_id")
        .collect()
    ]
    run, expect_a = 0, []
    costs = {1: 50, 2: 50, 3: 50, 4: 0}
    for d in ordered:
        if run < 100:
            expect_a.append(d)
        run += costs[d]
    assert kept & {1, 2, 3, 4} == set(expect_a)
    # stratum b: first doc always kept even if it alone busts the
    # budget; the doc after a busted budget is dropped
    ordered_b = [
        r.doc_id
        for r in df.filter(F.col("lang") == "b")
        .orderBy(cp.sample_key("doc_id", 11), "doc_id")
        .collect()
    ]
    if ordered_b == [5, 6]:
        assert kept & {5, 6} == {5}
    else:
        assert kept & {5, 6} == {6, 5}  # 1 token, then 500 crosses


def test_cap_per_group_exact_window_semantics(spark):
    """Uniform cap: at most n rows per group, the FIRST n in
    seeded-hash order (verified against an explicit sort), groups
    smaller than the cap keep everything, and the decision set is a
    pure function of (id, seed)."""
    docs = _docs(spark, 200)  # 50 per lang
    capped = cp.cap_per_group(docs, "doc_id", "lang", 10, seed=3)
    by_lang = {
        r["lang"]: r["n"]
        for r in capped.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang == {"en": 10, "fr": 10, "de": 10, "es": 10}
    # matches the explicit seeded-hash prefix per group
    want = {
        lang: [
            r["doc_id"]
            for r in docs.filter(F.col("lang") == lang)
            .orderBy(cp.sample_key("doc_id", 3), "doc_id")
            .limit(10)
            .collect()
        ]
        for lang in ("en", "fr", "de", "es")
    }
    got = {
        lang: sorted(
            r["doc_id"]
            for r in capped.filter(F.col("lang") == lang).collect()
        )
        for lang in ("en", "fr", "de", "es")
    }
    assert got == {k: sorted(v) for k, v in want.items()}
    # under-cap group keeps all rows
    small = cp.cap_per_group(_docs(spark, 20), "doc_id", "lang", 10, seed=3)
    assert small.count() == 20
    # re-run identical
    again = cp.cap_per_group(docs, "doc_id", "lang", 10, seed=3)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in capped.collect()
    )


def test_cap_per_group_prefilter_is_bit_identical(spark):
    """The prefiltered scale path (count-based Bernoulli pre-shrink +
    window) returns exactly the plain window's rows at default slack,
    and the underflow audit is empty; NULL groups cap correctly on
    both paths (null-safe count join)."""
    docs = _docs(spark, 400).withColumn(
        "lang",
        F.when(F.col("doc_id") % 13 == 0, F.lit(None)).otherwise(
            F.col("lang")
        ),
    )
    plain = cp.cap_per_group(docs, "doc_id", "lang", 12, seed=9)
    pre = cp.cap_per_group(
        docs, "doc_id", "lang", 12, seed=9, prefilter=True
    )
    key = lambda df: sorted(
        (r["lang"] or "", r["doc_id"]) for r in df.collect()
    )
    assert key(plain) == key(pre)
    assert cp.cap_underflow(docs, pre, "lang", 12).count() == 0
    # NULL group present and capped
    n_null = sum(1 for lang, _ in key(pre) if lang == "")
    assert 0 < n_null <= 12


def test_cap_per_group_underflow_detected_never_wrong(spark):
    """A deliberately starved pre-filter (safety ≪ 1) under-delivers
    but the rows it does deliver are a subset of the exact cap, and
    cap_underflow reports every shorted group."""
    docs = _docs(spark, 400)
    exact = cp.cap_per_group(docs, "doc_id", "lang", 40, seed=9)
    tight = cp.cap_per_group(
        docs, "doc_id", "lang", 40, seed=9, prefilter=True, safety=0.2
    )
    got = {r["doc_id"] for r in tight.collect()}
    assert got < {r["doc_id"] for r in exact.collect()}
    audit = cp.cap_underflow(docs, tight, "lang", 40).collect()
    shorted = {
        r["lang"]
        for r in tight.groupBy("lang").agg(F.count("*").alias("n")).collect()
        if r["n"] < 40
    }
    assert {r["lang"] for r in audit} == shorted and len(shorted) > 0


def test_leakage_safe_split_clusters_never_straddle(spark):
    """Every member of a cluster gets its representative's split;
    docs outside the map hash on their own id; assignment is total
    (every row gets exactly one split) and deterministic."""
    docs = _docs(spark, 300)
    # clusters: doc 3k and 3k+1 share representative 3k (doc 3k+2 is
    # a singleton)
    members = spark.range(100).select(
        (F.col("id") * 3).alias("rep")
    ).selectExpr("explode(array(rep, rep + 1)) AS member", "rep")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = cp.leakage_safe_split(
        docs, "doc_id", fr, seed=5, members=members
    )
    rows = out.select("doc_id", "split").collect()
    assert len(rows) == 300 and all(
        r["split"] in fr for r in rows
    )
    split_of = {r["doc_id"]: r["split"] for r in rows}
    for k in range(100):
        assert split_of[3 * k] == split_of[3 * k + 1], k
    # fractions roughly honored over representatives
    n_train = sum(1 for s in split_of.values() if s == "train")
    assert 200 <= n_train <= 285
    # deterministic re-run
    again = cp.leakage_safe_split(
        docs, "doc_id", fr, seed=5, members=members
    )
    assert {
        r["doc_id"]: r["split"] for r in again.collect()
    } == split_of


def test_leakage_safe_split_no_members_and_validation(spark):
    """members=None is a pure per-id hash split; bad fraction maps
    are refused loudly."""
    docs = _docs(spark, 200)
    out = cp.leakage_safe_split(
        docs, "doc_id", {"a": 0.5, "b": 0.5}, seed=1
    )
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == 200 and set(counts) <= {"a", "b"}
    assert 60 <= counts.get("a", 0) <= 140  # ~100 at p=.5
    with pytest.raises(ValueError, match="sum to 1"):
        cp.leakage_safe_split(docs, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="negative"):
        cp.leakage_safe_split(docs, "doc_id", {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="at least one"):
        cp.leakage_safe_split(docs, "doc_id", {})


def test_leakage_safe_split_chained_map_cannot_straddle(spark):
    """A CHAINED cluster map (cluster A's representative is itself a
    member of cluster B) is chased to its transitive fixpoint, so the
    whole chain lands in one split; resolve_chains=False refuses the
    same map loudly instead of silently letting members straddle."""
    docs = _docs(spark, 200)
    # depth-3 chain: 40→30, 30→20, 20→10 (exercises >1 doubling
    # round), plus a normal cluster 50→45 and the self-row 45→45
    chained = spark.createDataFrame(
        [(40, 30), (30, 20), (20, 10), (50, 45), (45, 45)],
        "member long, rep long",
    )
    fr = {"train": 0.5, "test": 0.5}
    split_of = {
        r["doc_id"]: r["split"]
        for r in cp.leakage_safe_split(
            docs, "doc_id", fr, seed=3, members=chained
        ).collect()
    }
    assert len(split_of) == 200  # no fan-out
    # the whole transitive chain hashes on root 10
    assert split_of[40] == split_of[30] == split_of[20] == split_of[10]
    assert split_of[50] == split_of[45]
    # refuse mode: chained map -> loud error; canonical map -> fine
    with pytest.raises(ValueError, match="chained"):
        cp.leakage_safe_split(
            docs, "doc_id", fr, seed=3, members=chained,
            resolve_chains=False,
        ).collect()
    canonical = spark.createDataFrame(
        [(40, 10), (30, 10), (20, 10), (50, 45)],
        "member long, rep long",
    )
    ok = {
        r["doc_id"]: r["split"]
        for r in cp.leakage_safe_split(
            docs, "doc_id", fr, seed=3, members=canonical,
            resolve_chains=False,
        ).collect()
    }
    # fixpoint chase and pre-canonicalized map agree exactly
    assert ok == split_of


def test_leakage_safe_split_chained_string_ids(spark):
    """Regression: the resolve_chains fixpoint routes through
    connected_components, whose former cast("long") nulled STRING ids
    and dropped every edge — each member silently fell back to itself
    and transitive near-dups straddled splits. String-keyed chained
    maps must now cluster exactly like the numeric path."""
    docs = spark.createDataFrame(
        [(f"doc-{i:03d}",) for i in range(200)], "doc_id string"
    )
    chained = spark.createDataFrame(
        [
            ("doc-040", "doc-030"),
            ("doc-030", "doc-020"),
            ("doc-020", "doc-010"),
            ("doc-050", "doc-045"),
        ],
        "member string, rep string",
    )
    fr = {"train": 0.5, "test": 0.5}
    split_of = {
        r["doc_id"]: r["split"]
        for r in cp.leakage_safe_split(
            docs, "doc_id", fr, seed=3, members=chained
        ).collect()
    }
    assert len(split_of) == 200
    # whole chain hashes on root doc-010 — identical to handing in the
    # pre-canonicalized map
    assert (
        split_of["doc-040"]
        == split_of["doc-030"]
        == split_of["doc-020"]
        == split_of["doc-010"]
    )
    assert split_of["doc-050"] == split_of["doc-045"]
    canonical = spark.createDataFrame(
        [
            ("doc-040", "doc-010"),
            ("doc-030", "doc-010"),
            ("doc-020", "doc-010"),
            ("doc-050", "doc-045"),
        ],
        "member string, rep string",
    )
    ok = {
        r["doc_id"]: r["split"]
        for r in cp.leakage_safe_split(
            docs, "doc_id", fr, seed=3, members=canonical,
            resolve_chains=False,
        ).collect()
    }
    assert ok == split_of


def test_leakage_safe_split_new_member_inherits_cluster_split(spark):
    """Incremental property: a NEW doc joining an existing cluster
    lands in the cluster's split (assignment depends only on the
    representative), and existing assignments never move."""
    fr = {"train": 0.75, "test": 0.25}
    docs_old = _docs(spark, 100)
    docs_new = _docs(spark, 101)  # doc 100 arrives
    members_old = spark.createDataFrame(
        [(7, 7), (8, 7)], "member long, rep long"
    )
    members_new = spark.createDataFrame(
        [(7, 7), (8, 7), (100, 7)], "member long, rep long"
    )
    old = {
        r["doc_id"]: r["split"]
        for r in cp.leakage_safe_split(
            docs_old, "doc_id", fr, seed=2, members=members_old
        ).collect()
    }
    new = {
        r["doc_id"]: r["split"]
        for r in cp.leakage_safe_split(
            docs_new, "doc_id", fr, seed=2, members=members_new
        ).collect()
    }
    assert new[100] == new[7] == old[7]
    assert all(new[i] == old[i] for i in range(100))


def test_cap_per_group_null_ids_identical_on_both_paths(spark):
    """NULL ids sort NULLS FIRST in the ranking window, so they are
    always inside the kept prefix — the pre-filter must pass their
    NULL sample keys through (`NULL < thr` is NULL, i.e. dropped)
    or the scale path silently loses exactly the rows the window
    keeps first."""
    docs = _docs(spark, 300).withColumn(
        "doc_id",
        F.when(F.col("doc_id") % 29 == 0, F.lit(None)).otherwise(
            F.col("doc_id")
        ),
    )
    plain = cp.cap_per_group(docs, "doc_id", "lang", 8, seed=4)
    pre = cp.cap_per_group(
        docs, "doc_id", "lang", 8, seed=4, prefilter=True
    )
    key = lambda df: sorted(
        (r["lang"], -1 if r["doc_id"] is None else r["doc_id"])
        for r in df.collect()
    )
    assert key(plain) == key(pre)
    # NULL ids are present in the output (they rank first)
    assert any(i == -1 for _, i in key(pre))


def test_leakage_safe_split_duplicate_member_rows_never_fan_out(spark):
    """A member listed under two clusters must not duplicate corpus
    rows through the split join: the map is canonicalized to the MIN
    representative per member before joining."""
    docs = _docs(spark, 30)
    members = spark.createDataFrame(
        [(5, 2), (5, 9), (6, 9)], "member long, rep long"
    )
    out = cp.leakage_safe_split(
        docs, "doc_id", {"a": 0.5, "b": 0.5}, seed=3, members=members
    )
    rows = out.select("doc_id", "split").collect()
    assert len(rows) == 30  # no fan-out
    split_of = {r["doc_id"]: r["split"] for r in rows}
    # 5 resolves to rep 2 (min), NOT rep 9
    ref = cp.leakage_safe_split(
        docs, "doc_id", {"a": 0.5, "b": 0.5}, seed=3,
        members=spark.createDataFrame(
            [(5, 2), (6, 9)], "member long, rep long"
        ),
    )
    assert split_of == {
        r["doc_id"]: r["split"] for r in ref.collect()
    }


def test_shard_manifest_verifies_delivery_integrity(spark, tmp_path):
    """write_training_shards(manifest=True) stamps per-shard digests;
    verify_training_shards is empty on the intact layer, then flags a
    lost shard file (row_mismatch/missing) and a duplicated one —
    the copy-between-stores failure modes."""
    import glob
    import os
    import shutil

    docs = _docs(spark, 400)
    path = str(tmp_path / "shards")
    cp.write_training_shards(
        docs, "doc_id", path, seed=7, n_shards=4, manifest=True
    )
    assert (
        cp.verify_training_shards(spark, path, "doc_id").count() == 0
    )
    # manifest covers every shard with sane ranges
    man = spark.read.parquet(f"{path}/_manifest")
    assert man.count() == 4
    assert sum(r["n_rows"] for r in man.collect()) == 400
    # corruption 1: drop one data file → its shard's digest mismatches
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 2
    lost = files[0]
    backup = str(tmp_path / "lost.parquet")
    shutil.copy(lost, backup)
    os.remove(lost)
    probs = {
        (r["shard"], r["problem"])
        for r in cp.verify_training_shards(spark, path, "doc_id").collect()
    }
    assert probs and all(
        p in ("row_mismatch", "missing_shard") for _, p in probs
    )
    # corruption 2: restore, then duplicate a file under a new name →
    # duplicated rows change the count but not min/max; the digest
    # (xor: duplicated rows cancel) plus count still flags it
    shutil.copy(backup, lost)
    shutil.copy(files[1], f"{path}/part-zz-copy.parquet")
    probs2 = {
        r["problem"]
        for r in cp.verify_training_shards(spark, path, "doc_id").collect()
    }
    assert "row_mismatch" in probs2


def test_read_training_shards_replays_verified_order(spark, tmp_path):
    """The reader side of the delivery loop: open verifies the
    manifest (clean layer reads; corrupted layer is REFUSED with the
    problem list), ordered=True replays the exact interleave,
    shard=i reads one contiguous slice, and an unattested layer needs
    an explicit verify=False."""
    import glob
    import os

    docs = _docs(spark, 400)
    path = str(tmp_path / "shards")
    cp.write_training_shards(
        docs, "doc_id", path, seed=7, n_shards=4, manifest=True
    )
    got = [
        r["doc_id"]
        for r in cp.read_training_shards(spark, path, "doc_id").collect()
    ]
    want = [
        r["doc_id"] for r in cp.interleave(docs, "doc_id", seed=7).collect()
    ]
    assert got == want
    # shard slices: concatenating shards 0..3 == the global order
    slices = []
    for i in range(4):
        slices += [
            r["doc_id"]
            for r in cp.read_training_shards(
                spark, path, "doc_id", shard=i
            ).collect()
        ]
    assert slices == want
    # corrupted delivery: drop a data file -> open refuses loudly
    lost = sorted(glob.glob(f"{path}/part-*.parquet"))[0]
    os.remove(lost)
    with pytest.raises(ValueError, match="fails manifest verification"):
        cp.read_training_shards(spark, path, "doc_id")
    # unattested layer: no manifest -> verify must be explicit
    path2 = str(tmp_path / "noman")
    cp.write_training_shards(docs, "doc_id", path2, seed=7, n_shards=4)
    with pytest.raises(ValueError, match="no _manifest"):
        cp.read_training_shards(spark, path2, "doc_id")
    assert (
        cp.read_training_shards(
            spark, path2, "doc_id", verify=False
        ).count()
        == 400
    )


def test_verify_shards_flags_broken_range_order(spark, tmp_path):
    """range_overlap: consecutive shards whose key ranges overlap mean
    concatenating shards in file order no longer replays the global
    interleave — the validator must flag it even when every row-set
    digest still matches."""
    docs = _docs(spark, 200)
    path = str(tmp_path / "shards_ro")
    cp.write_training_shards(
        docs, "doc_id", path, seed=7, n_shards=3, manifest=True
    )
    man = spark.read.parquet(f"{path}/_manifest").collect()
    # forge the manifest: copy shard 1's key range onto shard 2 so
    # ranges overlap while counts/digests keep matching their shards
    rows = []
    by_shard = {r["shard"]: r.asDict() for r in man}
    lo = min(by_shard)
    hi = sorted(by_shard)[1]
    forged = dict(by_shard[hi])
    forged["key_min"] = by_shard[lo]["key_min"]
    for s, r in by_shard.items():
        rows.append(forged if s == hi else r)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{path}/_manifest"
    )
    probs = {
        r["problem"]
        for r in cp.verify_training_shards(spark, path, "doc_id").collect()
    }
    assert "range_overlap" in probs


def test_leakage_safe_split_ascending_chain_cannot_straddle(spark):
    """r10 ADVICE fix: a chain whose rep-of-rep is LARGER — plausible
    when keepers are quality-chosen rather than min-id — must be
    detected and canonicalized exactly like a descending one (the old
    probe only flagged __rep2 < __rep, so (10→20),(20→30) silently
    returned still-chained). Mixed directions and a 2-cycle ride the
    same connected-components fallback."""
    docs = _docs(spark, 200)
    fr = {"train": 0.5, "test": 0.5}
    ascending = spark.createDataFrame(
        [(10, 20), (20, 30)], "member long, rep long"
    )
    split_of = {
        r["doc_id"]: r["split"]
        for r in cp.leakage_safe_split(
            docs, "doc_id", fr, seed=3, members=ascending
        ).collect()
    }
    assert len(split_of) == 200
    assert split_of[10] == split_of[20] == split_of[30]
    # refuse mode must also catch the ascending direction
    with pytest.raises(ValueError, match="chained"):
        cp.leakage_safe_split(
            docs, "doc_id", fr, seed=3, members=ascending,
            resolve_chains=False,
        ).collect()
    # the canonical form of the same cluster agrees exactly
    canonical = spark.createDataFrame(
        [(20, 10), (30, 10)], "member long, rep long"
    )
    ok = {
        r["doc_id"]: r["split"]
        for r in cp.leakage_safe_split(
            docs, "doc_id", fr, seed=3, members=canonical,
            resolve_chains=False,
        ).collect()
    }
    assert ok == split_of
    # mixed directions + a 2-cycle: one transitive cluster, one split
    tangled = spark.createDataFrame(
        [(7, 8), (8, 7), (9, 8), (9, 11)], "member long, rep long"
    )
    tangled_split = {
        r["doc_id"]: r["split"]
        for r in cp.leakage_safe_split(
            docs, "doc_id", fr, seed=3, members=tangled
        ).collect()
    }
    assert (
        tangled_split[7] == tangled_split[8]
        == tangled_split[9] == tangled_split[11]
    )


def test_read_training_shards_shard_slice_plans_no_exchange(
    spark, tmp_path
):
    """shard=i + ordered=True must keep the docstring's no-exchange
    contract: coalesce(1) + in-partition sort, never a range
    shuffle (r10 ADVICE fix — the old code planned a global orderBy
    on the slice)."""
    docs = _docs(spark, 200)
    path = str(tmp_path / "shards_ne")
    cp.write_training_shards(
        docs, "doc_id", path, seed=7, n_shards=4, manifest=True
    )
    sl = cp.read_training_shards(spark, path, "doc_id", shard=1)
    plan = sl._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # and the slice is still internally sorted on (__key, id)
    rows = [(r["__key"], r["doc_id"]) for r in sl.collect()]
    assert rows == sorted(rows)


def test_read_training_shards_keyset_resume_exactly_once(
    spark, tmp_path
):
    """r10 resume contract: a trainer that checkpoints the last
    (__key, id) it consumed and reopens with after=(key, id) gets
    exactly the remaining rows in the exact global order — nothing
    replayed, nothing skipped — and the keyset predicate reaches the
    parquet scan (PushedFilters) so pre-resume shards are pruned by
    row-group stats instead of re-read."""
    docs = _docs(spark, 300)
    path = str(tmp_path / "shards_resume")
    cp.write_training_shards(
        docs, "doc_id", path, seed=7, n_shards=4, manifest=True
    )
    full = [
        (r["__key"], r["doc_id"])
        for r in cp.read_training_shards(spark, path, "doc_id").collect()
    ]
    cut = 117  # mid-shard position
    resume_at = full[cut - 1]
    rest = cp.read_training_shards(
        spark, path, "doc_id", after=resume_at
    )
    got = [(r["__key"], r["doc_id"]) for r in rest.collect()]
    assert got == full[cut:]
    plan = rest._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "__key" in plan
    # composes with shard-at-a-time reading: resuming mid-shard then
    # concatenating the later shards replays the same tail
    by_shard = []
    for i in range(4):
        by_shard += [
            (r["__key"], r["doc_id"])
            for r in cp.read_training_shards(
                spark, path, "doc_id", shard=i, after=resume_at
            ).collect()
        ]
    assert by_shard == full[cut:]
