"""Property-based tests (hypothesis) for the semantics most likely to
drift under partitioning/ordering changes — each operator is checked
against a plain-Python reference implementation on generated inputs
(SURVEY.md §5: the reference has no property tests; these guard the
determinism contracts the engine adds on top).

Spark round trips are slow, so examples are few but adversarial:
hypothesis shrinks failures to minimal cases, which matters more here
than volume."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from projet_big_data_boutin_danre_spark.operators import cleaning, dedup

# Long-running lake-lifecycle / maintenance / property battery
# (r20): excluded from the default pytest run so the driver's
# verification window fits; opt in with `-m slow` (the round-close
# protocol runs fast + slow green). See pytest.ini.
pytestmark = pytest.mark.slow

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# (key, order) pairs with deliberate duplicates in both dimensions
_dup_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # key: few, collides
        st.integers(min_value=0, max_value=10),   # order: collides too
        st.integers(min_value=0, max_value=99),   # tiebreak payload
    ),
    min_size=1,
    max_size=30,
)


@settings(**SETTINGS)
@given(rows=_dup_rows)
def test_keep_last_dedup_matches_reference(spark, rows):
    """keep_last_dedup == per-key max over (order, tiebreak) — a pure
    function of the data, independent of input/partition order."""
    df = spark.createDataFrame(rows, "k int, ord int, tb int").repartition(7)
    got = {
        (r["k"], r["ord"], r["tb"])
        for r in cleaning.keep_last_dedup(df, ["k"], "ord", ["tb"]).collect()
    }
    expect = {}
    for k, o, t in rows:
        if k not in expect or (o, t) > (expect[k][1], expect[k][2]):
            expect[k] = (k, o, t)
    assert got == set(expect.values())


@settings(**SETTINGS)
@given(
    values=st.lists(
        st.one_of(
            st.none(),
            st.text(max_size=8),
            st.floats(allow_nan=False, allow_infinity=False, width=32).map(
                lambda f: repr(round(f, 3))
            ),
            st.integers(min_value=-10**9, max_value=10**9).map(str),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_coerce_numeric_matches_reference(spark, values):
    """coerce_numeric == the ACTUAL reference contract, pandas
    to_numeric(errors='coerce').fillna(0): parseable → float;
    unparseable, missing, and literal 'nan' → 0.0. (NOT Python
    float(): hypothesis found '1\\xa0' — float() strips unicode
    whitespace, pandas and Spark do not; and 'nan' parses to a
    non-null NaN that fillna must still zero.) Infinity spellings are
    excluded: pandas parses 'inf', Spark only 'Infinity' — documented
    divergence."""
    import math

    import pandas as pd
    from hypothesis import assume

    def ref(v):
        out = pd.to_numeric(pd.Series([v], dtype=object), errors="coerce")
        f = out.fillna(0.0)[0]
        return float(f)

    refs = [ref(v) for v in values]
    assume(all(math.isfinite(r) for r in refs))

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "i int, v string")
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i", cleaning.coerce_numeric("v").alias("out")
        ).collect()
    }
    for i, v in enumerate(values):
        assert got[i] == pytest.approx(refs[i]), (v, got[i], refs[i])


@settings(**SETTINGS)
@given(
    n_dupe_groups=st.integers(min_value=1, max_value=3),
    group_size=st.integers(min_value=2, max_value=12),
    cap=st.integers(min_value=2, max_value=6),
)
def test_lsh_hot_bucket_guard_invariants(spark, n_dupe_groups, group_size, cap):
    """For any duplicate-group layout and cap: (1) capped pairs are a
    subset of uncapped pairs, (2) every member of a duplicate group
    appears in some pair (nobody silently dropped), (3) per-group pair
    count is exactly C(min(cap,size),2) + max(0, size-cap)."""
    rows = []
    base = 0
    for g in range(n_dupe_groups):
        # group texts must be genuinely dissimilar — a first draft
        # differing by one character was (correctly!) cross-linked by
        # LSH as a near-duplicate, breaking the per-group pair count
        text = " ".join(f"tok{g}q{j}z{(g + 1) * (j + 3)}" for j in range(14))
        rows += [(base + i, text) for i in range(group_size)]
        base += 100
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(df, "doc_id", "text").collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(
            df, "doc_id", "text", max_bucket=cap
        ).collect()
    }
    assert capped <= uncapped
    assert {i for p in capped for i in p} == {r[0] for r in rows}
    m = min(cap, group_size)
    per_group = m * (m - 1) // 2 + max(0, group_size - cap)
    assert len(capped) == per_group * n_dupe_groups


@settings(**SETTINGS)
@given(
    offsets=st.lists(
        st.integers(min_value=-3600, max_value=3600), min_size=1, max_size=20
    ),
    wm_offset=st.integers(min_value=-3600, max_value=3600),
)
def test_incremental_batch_strict_inequality(spark, offsets, wm_offset):
    """incremental_batch keeps exactly the rows with ts STRICTLY after
    the watermark (the reference drops date <= last_fetched)."""
    from projet_big_data_boutin_danre_spark.streaming import incremental_batch

    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    rows = [(i, t0 + dt.timedelta(seconds=s)) for i, s in enumerate(offsets)]
    wm = t0 + dt.timedelta(seconds=wm_offset)
    df = spark.createDataFrame(rows, "i int, ts timestamp")
    got = {r["i"] for r in incremental_batch(df, "ts", wm).collect()}
    expect = {i for i, s in enumerate(offsets) if s > wm_offset}
    assert got == expect


@settings(**SETTINGS)
@given(
    text_len=st.integers(min_value=0, max_value=400),
    chunk_chars=st.integers(min_value=2, max_value=120),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_text_reconstructs_any_document(
    spark, text_len, chunk_chars, overlap_frac
):
    """For ANY (doc, chunk size, overlap): concatenating chunk 0 with
    every later chunk's non-overlapping tail reproduces the document
    exactly — no character lost or duplicated at any boundary."""
    from projet_big_data_boutin_danre_spark.operators import text as text_ops

    overlap = min(int(chunk_chars * overlap_frac), chunk_chars - 1)
    doc = "".join(chr(97 + (i * 7) % 26) for i in range(text_len))
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    rows = sorted(
        text_ops.chunk_text(
            df, "doc_id", "text", chunk_chars=chunk_chars, overlap=overlap
        ).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert rows[0]["chunk_id"] == 0
    assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
    rebuilt = rows[0]["chunk"] + "".join(r["chunk"][overlap:] for r in rows[1:])
    assert rebuilt == doc


@settings(**SETTINGS)
@given(
    text_len=st.integers(min_value=0, max_value=400),
    chunk_chars=st.integers(min_value=2, max_value=120),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_window_arithmetic_matches_operator(
    spark, text_len, chunk_chars, overlap_frac
):
    """The analytic window formula the token_stats ORACLE uses
    (generate_series starts; per-chunk size least(C, max(L-s+1, 0)))
    must equal the operator's actual chunk count and summed sizes for
    ANY (length, chunk size, overlap) — this is the identity that
    makes the DuckDB twin an independent check rather than a copy."""
    from projet_big_data_boutin_danre_spark.operators import text as text_ops

    overlap = min(int(chunk_chars * overlap_frac), chunk_chars - 1)
    step = chunk_chars - overlap
    doc = "".join(chr(97 + (i * 5) % 26) for i in range(text_len))
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    rows = text_ops.chunk_text(
        df, "doc_id", "text", chunk_chars=chunk_chars, overlap=overlap
    ).collect()
    starts = list(range(1, max(text_len - overlap, 1) + 1, step))
    assert len(rows) == len(starts)
    assert sum(r["n_chars"] for r in rows) == sum(
        min(chunk_chars, max(text_len - s + 1, 0)) for s in starts
    )


@settings(**SETTINGS)
@given(
    left_offsets=st.lists(
        st.integers(min_value=0, max_value=600), min_size=1, max_size=15
    ),
    right_offsets=st.lists(
        st.integers(min_value=0, max_value=600), min_size=1, max_size=10,
        unique=True,
    ),
)
def test_asof_join_matches_pandas_merge_asof(
    spark, left_offsets, right_offsets
):
    """asof_join == pandas merge_asof (backward, inclusive) on a single
    key for generated timestamps — the same reference DuckDB's native
    ASOF JOIN implements."""
    import pandas as pd

    from projet_big_data_boutin_danre_spark.operators.asof import asof_join

    t0 = dt.datetime(2025, 3, 1)
    left = [(i, 1, t0 + dt.timedelta(seconds=s))
            for i, s in enumerate(left_offsets)]
    right = [(1, t0 + dt.timedelta(seconds=s), float(s))
             for s in right_offsets]
    ldf = spark.createDataFrame(left, "event_id long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "k long, ts timestamp, v double")
    got = {
        r["event_id"]: r["v"]
        for r in asof_join(ldf, rdf, "k", "ts", "ts", ["v"]).collect()
    }

    lp = pd.DataFrame(left, columns=["event_id", "k", "ts"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values("ts", kind="stable")
    ref = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    expect = {
        int(r.event_id): (None if pd.isna(r.v) else float(r.v))
        for r in ref.itertuples()
    }
    assert got == expect


@settings(**SETTINGS)
@given(
    point_offsets=st.lists(
        st.integers(min_value=0, max_value=7200), min_size=1, max_size=15
    ),
    start=st.integers(min_value=0, max_value=3600),
    length=st.integers(min_value=0, max_value=3600),
    bin_width=st.sampled_from([60, 600, 1800, 3600]),
)
def test_interval_join_matches_reference(
    spark, point_offsets, start, length, bin_width
):
    """Binned interval join == the naive inclusive-bounds definition
    for any bin width (bins are an implementation detail: points must
    appear exactly once however many bins the interval spans)."""
    from projet_big_data_boutin_danre_spark.operators.rangejoin import (
        interval_join,
    )

    t0 = dt.datetime(2025, 5, 1)
    pts = [(i, 1, t0 + dt.timedelta(seconds=s))
           for i, s in enumerate(point_offsets)]
    s_ts = t0 + dt.timedelta(seconds=start)
    e_ts = t0 + dt.timedelta(seconds=start + length)
    points = spark.createDataFrame(
        pts, "event_id long, k long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(1, s_ts, e_ts)], "k long, s timestamp, e timestamp"
    )
    got = sorted(
        r["event_id"]
        for r in interval_join(
            points, intervals, "k", "ts", "s", "e", bin_width_sec=bin_width
        ).collect()
    )
    expect = sorted(
        i for i, s in enumerate(point_offsets) if start <= s <= start + length
    )
    assert got == expect


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),     # id: collides
            st.integers(min_value=0, max_value=120),   # minutes offset
        ),
        min_size=1,
        max_size=12,
    ),
    split_at=st.integers(min_value=0, max_value=12),
)
def test_stream_keep_last_agrees_with_batch_on_random_data(
    spark, tmp_path_factory, rows, split_at
):
    """For ANY duplicated dataset and ANY batch split point, the
    streaming keep-last dedup converges to the batch operator's result
    (few examples — each costs a full streaming query — but hypothesis
    shrinks any failure to a minimal id/timing layout)."""
    from projet_big_data_boutin_danre_spark.operators.cleaning import (
        keep_last_dedup,
    )
    from projet_big_data_boutin_danre_spark.streaming.stream_dedup import (
        dedup_stream_keep_last,
    )

    t0 = dt.datetime(2025, 2, 1, 8, 0)
    data = [
        (rid, t0 + dt.timedelta(minutes=mins), i)
        for i, (rid, mins) in enumerate(rows)
    ]
    schema = "id long, ts timestamp, seq long"
    batch = {
        (r["id"], r["ts"], r["seq"])
        for r in keep_last_dedup(
            spark.createDataFrame(data, schema), ["id"], "ts", ["seq"]
        ).collect()
    }

    src = tmp_path_factory.mktemp("kl_prop")
    files = [data[:split_at], data[split_at:]]
    for i, chunk in enumerate(f for f in files if f):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    name = f"klp_{abs(hash((tuple(rows), split_at))) % 10**9}"
    q = (
        dedup_stream_keep_last(stream, "id", "ts", tiebreak=("seq",))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r["id"], r["ts"], r["seq"])
        for r in keep_last_dedup(
            spark.sql(f"SELECT * FROM {name}"), ["id"], "ts", ["seq"]
        ).collect()
    }
    assert streamed == batch


_texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
        min_size=0,
        max_size=300,
    ),
    min_size=1,
    max_size=8,
)


@settings(**SETTINGS)
@given(texts=_texts)
def test_chunk_assemble_round_trip_random_unicode(spark, texts):
    """chunk_text(overlap=0) → assemble_chunks is the identity on
    arbitrary unicode documents (emoji, CJK, combining marks,
    newlines): the substring windows partition the text exactly and
    reassembly is arrival-order-proof."""
    from projet_big_data_boutin_danre_spark.operators.text import (
        assemble_chunks,
        chunk_text,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_text(df, "doc_id", "text", chunk_chars=7, overlap=0)
    back = {
        r["doc_id"]: r["text"]
        for r in assemble_chunks(chunks.repartition(5)).collect()
    }
    assert back == {i: t for i, t in rows}


@settings(**SETTINGS)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                 max_size=40, unique=True),
    frac=st.floats(min_value=0.0, max_value=1.0),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_stratified_sample_matches_hashlib_reference(spark, ids, frac, seed):
    """The Spark sampler's keep set == a plain-Python hashlib.md5
    reference — a third engine opinion (beyond DuckDB) that the md5
    threshold semantics are exactly as specified."""
    import hashlib

    from projet_big_data_boutin_danre_spark.operators import corpus_prep as cp

    df = spark.createDataFrame(
        [(i, "s") for i in ids], "doc_id long, grp string"
    )
    got = {
        r["doc_id"]
        for r in cp.stratified_sample(
            df, "doc_id", "grp", {"s": frac}, seed=seed
        ).collect()
    }
    thr = cp.hex_threshold(frac)
    expect = {
        i
        for i in ids
        if hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8] < thr
    }
    assert got == expect


_edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=25),
        st.integers(min_value=0, max_value=25),
    ),
    min_size=1,
    max_size=40,
)


@settings(**SETTINGS)
@given(edges=_edge_lists)
def test_connected_components_matches_union_find(spark, edges):
    """Star-contraction CC == union-find min-labeling on arbitrary
    multigraphs (self-loops, duplicate and reversed edges included) —
    the distributed fixpoint must be a pure function of the edge SET."""
    clean = [(a, b) for a, b in edges if a != b]
    nodes = sorted({x for e in clean for x in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in clean:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    expect = {n: min(ns) for ns in comp.values() for n in ns}

    df = spark.createDataFrame(edges, "id_a long, id_b long").repartition(5)
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == expect


_corpus_texts = st.lists(
    st.one_of(
        st.text(
            alphabet="ab c",  # tiny alphabet: dense bigram collisions
            max_size=30,
        ),
        st.none(),
    ),
    min_size=1,
    max_size=12,
)


@settings(**SETTINGS)
@given(texts=_corpus_texts, min_count=st.integers(min_value=1, max_value=3))
def test_lm_ppl_matches_pure_python_reference(spark, texts, min_count):
    """Distributed train+score == the driver-side reference LM on any
    corpus: hit counts exactly, perplexity to float tolerance —
    independent of partitioning (repartition(5) shuffles input)."""
    from projet_big_data_boutin_danre_spark.operators import lm

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)
    model = lm.ngram_counts(df, "text", n=2, min_count=min_count)
    ctx = lm.context_totals(df, "text", n=2)
    got = {
        r.doc_id: r.ppl
        for r in lm.score_documents(
            df, "doc_id", "text", model, ctx, n=2
        ).collect()
    }
    clean = [t for t in texts if t]
    for i, t in rows:
        ref = (
            lm.reference_ppl(clean, t, n=2, min_count=min_count)
            if t
            else None
        )
        if ref is None:
            assert i not in got
        else:
            assert got[i] == pytest.approx(ref, rel=1e-9)


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="abcdefgh XY2,.", max_size=40),
        min_size=1,
        max_size=10,
    ),
    n_merges=st.integers(min_value=0, max_value=12),
)
def test_bpe_round_trips_any_corpus(spark, texts, n_merges):
    """decode(encode(x)) == normalize(x) for ANY text and ANY number
    of merges trained on that corpus — the tokenizer never loses
    bytes."""
    import re

    from projet_big_data_boutin_danre_spark.operators import bpe

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.train_bpe(bpe.word_histogram(df, "text"), n_merges)
    enc = {
        r.doc_id: r.bpe_tokens
        for r in bpe.encode(df, "doc_id", "text", merges).collect()
    }
    for i, t in rows:
        norm = re.sub(
            r" +", " ", re.sub(r"[^a-z0-9]+", " ", t.lower())
        ).strip()
        assert bpe.decode(enc[i]) == norm


_cap_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),  # id (dups possible)
        st.sampled_from(["a", "b", "c", None]),   # group incl. NULL
    ),
    min_size=1,
    max_size=40,
)


@settings(**SETTINGS)
@given(rows=_cap_rows, cap=st.integers(min_value=1, max_value=6),
       seed=st.integers(min_value=0, max_value=9))
def test_cap_per_group_matches_reference_and_prefilter(spark, rows, cap, seed):
    """cap_per_group == the first `cap` rows of each group in
    (md5 key, id) order, computed by a plain-Python reference; the
    prefiltered scale path returns the identical set (generated
    inputs include duplicate ids and NULL groups)."""
    import hashlib

    from projet_big_data_boutin_danre_spark.operators import corpus_prep

    rows = list({(i, g) for i, g in rows})  # unique (id, group) pairs
    df = spark.createDataFrame(rows, "doc_id long, grp string").repartition(5)
    plain = corpus_prep.cap_per_group(df, "doc_id", "grp", cap, seed=seed)
    pre = corpus_prep.cap_per_group(
        df, "doc_id", "grp", cap, seed=seed, prefilter=True
    )
    key = lambda out: sorted(
        (g or "", i) for i, g in
        ((r["doc_id"], r["grp"]) for r in out.collect())
    )
    # python reference: md5 slice order per group, ties by id
    def skey(i):
        return hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8]

    expect = []
    for g in {g for _, g in rows}:
        members = sorted(
            (i for i, gg in rows if gg == g), key=lambda i: (skey(i), i)
        )
        expect += [(g or "", i) for i in members[:cap]]
    assert key(plain) == sorted(expect)
    assert key(pre) == sorted(expect)


@settings(**SETTINGS)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=300),
                 min_size=1, max_size=30, unique=True),
    seed=st.integers(min_value=0, max_value=9),
    cut=st.integers(min_value=1, max_value=99),
)
def test_leakage_safe_split_matches_reference(spark, ids, seed, cut):
    """Split assignment == a plain-Python threshold scan of the same
    cumulative md5 key ranges, for arbitrary two-way fractions."""
    import hashlib

    from projet_big_data_boutin_danre_spark.operators import corpus_prep

    fr = {"train": cut / 100.0, "rest": 1.0 - cut / 100.0}
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["split"]
        for r in corpus_prep.leakage_safe_split(
            df, "doc_id", fr, seed=seed
        ).collect()
    }
    thr = corpus_prep.hex_threshold(cut / 100.0)
    expect = {
        i: (
            "train"
            if hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8] < thr
            else "rest"
        )
        for i in ids
    }
    assert got == expect


# texts over a tiny alphabet with newlines so duplicate lines and
# multi-line structure are common; None mixed in for the NULL path
_line_texts = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.sampled_from(
                ["dup line alpha long", "dup line beta longer",
                 "x", "", "unique %d"]
            ),
            min_size=0,
            max_size=6,
        ).map(
            lambda ls: "\n".join(
                l % i if "%d" in l else l for i, l in enumerate(ls)
            )
        ),
    ),
    min_size=1,
    max_size=12,
)


def _ref_drop_common_lines(rows, min_df, min_len):
    """Plain-Python reference: census of DISTINCT-doc counts over
    qualifying lines, then order-preserving removal."""
    from collections import defaultdict

    seen = defaultdict(set)
    for i, t in rows:
        if t is None:
            continue
        for ln in t.split("\n"):
            if len(ln) >= min_len:
                seen[ln].add(i)
    common = {ln for ln, ids in seen.items() if len(ids) >= min_df}
    out = {}
    for i, t in rows:
        if t is None:
            out[i] = (None, 0)
            continue
        kept = [
            ln
            for ln in t.split("\n")
            if not (len(ln) >= min_len and ln in common)
        ]
        dropped = len(t.split("\n")) - len(kept)
        out[i] = ("\n".join(kept), dropped)
    return out


@settings(**SETTINGS)
@given(texts=_line_texts, min_df=st.integers(2, 3))
def test_drop_common_lines_matches_reference(spark, texts, min_df):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["kept_text"], r["n_lines_dropped"])
        for r in dedup.drop_common_lines(
            df, "doc_id", "text", min_df=min_df, min_len=4
        ).collect()
    }
    assert got == _ref_drop_common_lines(rows, min_df, 4)


def _ref_c4(rows, w=3):
    """Plain-Python C4 reference: exhaustive sentence segmentation,
    w-sentence windows with char offsets, global first-occurrence
    keeper on the exact span text, union-of-ranges cut."""
    import re
    from collections import defaultdict

    pat = re.compile(r"[^.!?]*[.!?]+|[^.!?]+$")
    occs = defaultdict(list)  # span text -> [(doc, start0, end0excl)]
    per_doc = {}
    for i, t in rows:
        if t is None:
            per_doc[i] = None
            continue
        sents = pat.findall(t)
        assert "".join(sents) == t  # exhaustiveness invariant
        offs, pos = [], 0
        for s in sents:
            offs.append((pos, pos + len(s)))
            pos += len(s)
        per_doc[i] = t
        for j in range(len(sents) - w + 1):
            span = "".join(sents[j : j + w])
            occs[span].append((i, offs[j][0], offs[j + w - 1][1]))
    cut_ranges = defaultdict(list)
    for span, lst in occs.items():
        if len(lst) < 2:
            continue
        lst.sort()
        for i, s, e in lst[1:]:
            cut_ranges[i].append((s, e))
    out = {}
    for i, t in rows:
        if t is None:
            out[i] = (None, 0)
            continue
        drop = [False] * len(t)
        for s, e in cut_ranges.get(i, ()):
            for p in range(s, e):
                drop[p] = True
        kept = "".join(ch for p, ch in enumerate(t) if not drop[p])
        out[i] = (kept, len(t) - len(kept))
    return out


# sentence soup: a few shared sentences so 3-windows repeat across
# docs, plus per-doc unique ones and unterminated tails
_sent_texts = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.sampled_from(
                ["Shared alpha one.", "Shared beta two!",
                 "Shared gamma three?", "tail without end",
                 "Unique %d."]
            ),
            min_size=0,
            max_size=7,
        ).map(
            lambda ls: " ".join(
                l % i if "%d" in l else l for i, l in enumerate(ls)
            )
        ),
    ),
    min_size=1,
    max_size=8,
)


@settings(**SETTINGS)
@given(texts=_sent_texts)
def test_c4_sentence_dedup_matches_reference(spark, texts):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["cut_text"], r["n_cut_chars"])
        for r in dedup.c4_sentence_dedup(df, "doc_id", "text").collect()
    }
    assert got == _ref_c4(rows)


def _ref_gopher(rows, min_words=50, max_words=100_000, min_stop=2):
    """Plain-Python Gopher reference (regex constructs restricted to
    ones with identical Python-re/Java semantics: explicit classes,
    ASCII \\b)."""
    import re

    out = {}
    for i, t in rows:
        if t is None:
            out[i] = (0, 0, 0, 0, False)
            continue
        words = re.findall(r"[^ \t\f\r\x0B\n]+", t)
        lines = t.split("\n")
        w = len(words)
        chars = sum(len(x) for x in words)
        sym = (
            t.count("#") + len(re.findall(r"\.\.\.", t)) + t.count("…")
        )
        bullets = sum(
            1 for ln in lines if re.match(r"^[ \t]*[-*•]", ln)
        )
        ellipsis = sum(
            1 for ln in lines if re.search(r"(\.\.\.|…)[ \t]*$", ln)
        )
        alpha = sum(1 for x in words if re.search("[A-Za-z]", x))
        stops = sum(
            1
            for s in ("the", "be", "to", "of", "and", "that", "have",
                      "with")
            if re.search(rf"\b{s}\b", t.lower())
        )
        passed = (
            min_words <= w <= max_words
            and 3 * w <= chars <= 10 * w
            and 10 * sym <= w
            and 10 * bullets <= 9 * len(lines)
            and 10 * ellipsis <= 3 * len(lines)
            and 10 * alpha >= 8 * w
            and stops >= min_stop
        )
        out[i] = (w, chars, sym, stops, passed)
    return out


_gopher_texts = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet="ab #.\t\n-*…!the of",
            min_size=0,
            max_size=120,
        ),
    ),
    min_size=1,
    max_size=10,
)


@settings(**SETTINGS)
@given(texts=_gopher_texts, min_words=st.integers(1, 8))
def test_gopher_rules_matches_reference(spark, texts, min_words):
    from projet_big_data_boutin_danre_spark.operators import text as t

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["g_words"], r["g_word_chars"], r["g_symbols"],
            r["g_stop_hits"], r["gopher_pass"],
        )
        for r in t.gopher_rules(
            df, "doc_id", "text", min_words=min_words, min_stop_hits=1
        ).collect()
    }
    assert got == _ref_gopher(rows, min_words=min_words, min_stop=1)
