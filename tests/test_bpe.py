"""BPE tokenizer training + encoding (operators/bpe.py): merge
selection pinned on the classic Sennrich corpus, byte-exact
encode/decode round-trip against the JVM-side normalizer, and the
map-only (no shuffle) encode plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.operators import bpe


def test_train_merges_sennrich_corpus(spark):
    """The worked example from the BPE paper: es / est merge first."""
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_bpe(hist, n_merges=4)
    # (e,s) freq 9 ties (s,t</w>) at 9 -> lexicographically smaller
    # ('e','s') wins; then ('es','t</w>') has freq 9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t</w>")
    # merges apply during encoding
    assert bpe.encode_word(
        "newest", {p: i for i, p in enumerate(merges)}
    )[-1] == "est</w>"


def test_train_is_deterministic_and_stops_on_hapax(spark):
    hist = [("ab", 1), ("cd", 1)]  # every pair occurs once
    assert bpe.train_bpe(hist, n_merges=10) == []
    hist2 = [("aaab", 3), ("aaac", 2)]
    m1 = bpe.train_bpe(hist2, n_merges=3)
    m2 = bpe.train_bpe(list(reversed(hist2)), n_merges=3)
    assert m1 == m2  # input order never changes the result


def test_word_histogram_matches_tokens(spark):
    df = spark.createDataFrame(
        [(1, "Low low! NEWEST."), (2, "widest newest")],
        "doc_id long, text string",
    )
    hist = {r.word: r.n for r in bpe.word_histogram(df, "text").collect()}
    assert hist == {"low": 2, "newest": 2, "widest": 1}
    capped = bpe.word_histogram(df, "text", max_words=2)
    assert {r.word for r in capped.collect()} == {"low", "newest"}


def test_word_histogram_cap_is_distributed_topn(spark):
    # the max_words cap must compile to TakeOrderedAndProject
    # (per-partition heaps), never a Window with no partition key —
    # the distinct-word histogram of web text is billions of rows,
    # so a single-reducer rank over it is a scale-killer
    df = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    capped = bpe.word_histogram(df, "text", max_words=3)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_encode_decode_round_trip(spark):
    df = spark.createDataFrame(
        [
            (1, "the lowest newest low"),
            (2, "Wide, WIDEST lower!"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe(bpe.word_histogram(df, "text"), n_merges=8)
    enc = {r.doc_id: r for r in bpe.encode(df, "doc_id", "text", merges).collect()}
    # round trip: decode(encode(x)) == normalize(x)
    norm = {
        r.doc_id: r.nt
        for r in df.select(
            "doc_id",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "),
                    " +",
                    " ",
                )
            ).alias("nt"),
        ).collect()
    }
    for d in (1, 2):
        assert bpe.decode(enc[d].bpe_tokens) == norm[d]
        assert enc[d].n_bpe == len(enc[d].bpe_tokens)
    assert enc[3].bpe_tokens == [] and enc[4].bpe_tokens == []
    # merging strictly compresses vs character tokens
    char_len = sum(len(w) for w in norm[1].split(" "))
    assert 0 < enc[1].n_bpe < char_len


def test_encode_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = bpe.encode(df, "doc_id", "text", [("a", "b</w>")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: scan -> project
    assert "ArrowEvalPython" in plan  # Arrow-batched, not row-at-a-time


def test_more_merges_never_lengthen_encoding(spark):
    hist = [("banana", 4), ("bandana", 3), ("cabana", 2)]
    prev = None
    for k in (0, 2, 4, 8):
        merges = bpe.train_bpe(hist, n_merges=k)
        ranks = {p: i for i, p in enumerate(merges)}
        n = sum(len(bpe.encode_word(w, ranks)) * c for w, c in hist)
        if prev is not None:
            assert n <= prev
        prev = n
