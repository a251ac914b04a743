"""Connected components + cluster application over near-dup pairs.

The Spark implementation (alternating large-star/small-star) is
checked against a pure-Python union-find on adversarial graph shapes —
chains (worst case for naive label propagation), cliques, stars,
random multigraphs — plus end-to-end through dedup_clusters /
drop_near_duplicates on real documents. The DuckDB oracle twin
(recursive transitive-closure CTE in the minhash_lsh_pairs slot)
covers the cross-engine angle; these tests cover shapes the sf
corpus doesn't produce.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.operators import dedup
from projet_big_data_boutin_danre_spark.sources.readers import load_table


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    nodes = sorted({x for e in edges for x in e})
    parent = {n: n for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns) for ns in comp.values() for n in ns}


def _cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["component"]
        for r in dedup.connected_components(df).collect()
    }


@pytest.mark.parametrize(
    "name,edges",
    [
        # chain: diameter n — naive min-propagation would need ~n
        # rounds; star-contraction must still converge inside max_iter
        ("chain", [(i, i + 1) for i in range(1, 40)]),
        ("reverse_chain", [(i + 1, i) for i in range(50, 90)]),
        (
            "two_cliques",
            [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
            + [(10 + a, 10 + b) for a in range(4) for b in range(a + 1, 4)],
        ),
        ("star", [(1, k) for k in range(2, 25)]),
        ("self_loops_dups", [(3, 3), (1, 2), (2, 1), (1, 2), (7, 7)]),
    ],
)
def test_connected_components_shapes(spark, name, edges):
    clean = [(a, b) for a, b in edges if a != b]
    assert _cc(spark, edges) == _uf_components(clean)


def test_connected_components_random_graph(spark):
    rng = random.Random(7)
    edges = [
        (rng.randrange(1, 300), rng.randrange(1, 300)) for _ in range(250)
    ]
    clean = [(a, b) for a, b in edges if a != b]
    assert _cc(spark, edges) == _uf_components(clean)


def test_connected_components_string_ids_match_numeric(spark):
    """String doc ids (the common real-corpus key) must produce the
    SAME clusters as the numeric path — the dense-dictionary route,
    not a silent cast("long")-to-null edge wipeout that would turn
    every member into a singleton."""
    rng = random.Random(11)
    edges = [
        (rng.randrange(1, 120), rng.randrange(1, 120)) for _ in range(100)
    ]
    clean = [(a, b) for a, b in edges if a != b]
    expected = {
        f"doc-{n:04d}": f"doc-{c:04d}"
        for n, c in _uf_components(clean).items()
    }
    df = spark.createDataFrame(
        [(f"doc-{a:04d}", f"doc-{b:04d}") for a, b in edges],
        "id_a string, id_b string",
    )
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == expected


def test_connected_components_string_keeper_is_lexicographic_min(spark):
    """The keeper contract carries over verbatim: component = the
    lexicographically smallest reachable id (zero-padding-free ids
    where lexicographic and numeric order diverge)."""
    df = spark.createDataFrame(
        [("b9", "b10"), ("b10", "alpha"), ("zz", "z2")],
        "id_a string, id_b string",
    )
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == {
        "b9": "alpha",
        "b10": "alpha",
        "alpha": "alpha",
        "zz": "z2",
        "z2": "z2",
    }


def test_connected_components_frees_superseded_round_checkpoints(spark):
    """The star loop checkpoints every round; superseded rounds must
    be UNPERSISTED as soon as the next round materializes (r11
    verdict #6: keeping all rounds alive GC-OOMs the default 8 g
    driver at the 32× probe volume). A long chain forces many rounds;
    the persistent-RDD census afterwards may hold the final round,
    the peel frames, and the input — never one block set per round."""
    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 60)], "id_a long, id_b long"
    )
    st: dict = {}
    out = dedup.connected_components(
        df, stats=st, small_graph_threshold=None
    )
    assert out.count() == 60  # nodes 1..60
    assert st["rounds"] >= 3  # the chain actually iterated
    after = sc._jsc.sc().getPersistentRDDs().size()
    assert after - before <= 3, (
        f"{after - before} checkpoint block sets alive after "
        f"{st['rounds']} rounds — superseded rounds are not freed"
    )


def test_connected_components_nonconvergence_raises(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(
            df, max_iter=1, small_graph_threshold=None
        )


def test_dedup_clusters_and_apply(spark, sf0001):
    docs = load_table(spark, sf0001, "documents")
    members = dedup.dedup_clusters(docs, "doc_id", "text")
    rows = members.collect()
    assert rows, "sf0.001 documents contain near-dups by construction"
    by_node = {r["node"]: r["component"] for r in rows}
    # component id is the cluster minimum and a member of the cluster
    for comp in set(by_node.values()):
        cluster = [n for n, c in by_node.items() if c == comp]
        assert min(cluster) == comp
    kept = dedup.drop_near_duplicates(docs, "doc_id", members)
    n_docs = docs.count()
    n_losers = sum(1 for n, c in by_node.items() if n != c)
    assert kept.count() == n_docs - n_losers
    # every kept id is either a keeper or unclustered
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert all(by_node.get(i, i) == i for i in kept_ids)


def test_dedup_clusters_string_ids_end_to_end(spark, sf0001):
    """The full LSH → CC → apply pipeline on STRING doc ids (the
    common real-corpus key) yields exactly the numeric-id clustering
    under the id rename — locks the r12 string-id CC path at the
    operator level, not just on raw edge frames."""
    docs = load_table(spark, sf0001, "documents")
    tag = F.format_string("doc-%06d", F.col("doc_id"))
    sdocs = docs.select(tag.alias("doc_id"), "text")
    expected = {
        f"doc-{r['node']:06d}": f"doc-{r['component']:06d}"
        for r in dedup.dedup_clusters(docs, "doc_id", "text").collect()
    }
    got = {
        r["node"]: r["component"]
        for r in dedup.dedup_clusters(sdocs, "doc_id", "text").collect()
    }
    assert got == expected and got
    kept = dedup.drop_near_duplicates(
        sdocs, "doc_id", dedup.dedup_clusters(sdocs, "doc_id", "text")
    )
    n_losers = sum(1 for n, c in got.items() if n != c)
    assert kept.count() == docs.count() - n_losers


def test_dedup_clusters_production_profile_matches_exact(spark, sf0001):
    docs = load_table(spark, sf0001, "documents")
    exact = dedup.dedup_clusters(docs, "doc_id", "text")
    prod = dedup.dedup_clusters(
        docs, "doc_id", "text", scale_profile="production"
    )
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, prod.collect())
    )


def test_connected_components_single_shuffle_rounds(spark):
    """Each round must stay pure DataFrame algebra: no cartesian
    products and no Python row UDFs in the iterated plan."""
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 8)], "id_a long, id_b long"
    )
    out = dedup.connected_components(df, small_graph_threshold=None)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    ) if hasattr(out._sc._jvm, "PythonSQLUtils") else out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_duplicate_spans_merging_and_self_repetition(spark):
    shared = "abcdefghijklmnopqrstuvwxyz"  # 26 chars > min_len
    rows = [
        # docs 1 and 2 share a 26-char run at different offsets
        (1, "xx " + shared + " tail one"),
        (2, "completely other prefix " + shared),
        # doc 3: internal self-repetition of a 20-char block
        (3, "00000000001111111111" + " mid " + "00000000001111111111"),
        # doc 4: no duplication anywhere, long enough to window
        (4, "qqww eerr ttyy uuii oopp aass ddff gghh jjkk llzz xxcc vvbb"),
        # doc 5: shorter than min_len -> never windowed
        (5, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {}
    for r in dedup.duplicate_spans(df, "doc_id", "text", min_len=20).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert 1 in spans and 2 in spans and 3 in spans
    assert 4 not in spans and 5 not in spans
    # cross-doc sharing merges into ONE span per doc
    assert len(spans[1]) == 1 and len(spans[2]) == 1
    # doc 1's normalized text is "xx abcdefghijklmnopqrstuvwxyz tail
    # one": the shared run occupies [4, 29]; the span must cover it
    s1, e1 = spans[1][0]
    assert s1 <= 4 and e1 >= 29
    # self-repetition: the two copies sit 25 apart (> min_len), so
    # they form TWO islands, each covering its copy exactly
    assert sorted(spans[3]) == [(1, 20), (26, 45)]


def test_duplicate_span_stats_fractions(spark):
    rows = [
        (1, "abcdefghijklmnopqrstuvwxyz"),   # fully duplicated vs doc 2
        (2, "abcdefghijklmnopqrstuvwxyz"),
        (3, "entirely unique content with no repeats whatsoever here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_dup_spans, r.dup_chars, r.dup_char_frac)
        for r in dedup.duplicate_span_stats(df, "doc_id", "text").collect()
    }
    assert out[1] == (1, 26, 1.0)  # whole doc covered
    assert out[2] == (1, 26, 1.0)
    assert out[3] == (0, 0, 0.0)


def test_connected_components_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.connected_components(df).count() == 0
    docs = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    kept = dedup.drop_near_duplicates(
        docs, "doc_id", dedup.connected_components(df)
    )
    assert kept.count() == 2  # empty clustering keeps everything


def test_duplicate_spans_hash_family_parity(spark):
    """md5 (oracle) and fast (xxhash64 struct window key) families
    must emit IDENTICAL spans — only the shuffle key width differs."""
    rows = [
        (1, "xx abcdefghijklmnopqrstuvwxyz tail one"),
        (2, "completely other prefix abcdefghijklmnopqrstuvwxyz"),
        (3, "00000000001111111111 mid 00000000001111111111"),
        (4, "qqww eerr ttyy uuii oopp aass ddff gghh jjkk llzz xxcc"),
        (5, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def spans(fam):
        return sorted(
            (r.doc_id, r.span_start, r.span_end)
            for r in dedup.duplicate_spans(
                df, "doc_id", "text", min_len=20, hash_family=fam
            ).collect()
        )

    assert spans("md5") == spans("fast")
    import pytest

    with pytest.raises(ValueError):
        dedup.duplicate_spans(df, "doc_id", "text", hash_family="crc")


def test_duplicate_span_stats_accepts_precomputed_spans(spark):
    """The cover rollup derived from a precomputed spans frame must
    equal the recompute-from-scratch path (the q_exact_dedup reuse)."""
    rows = [
        (1, "abcdefghijklmnopqrstuvwxyz"),
        (2, "abcdefghijklmnopqrstuvwxyz"),
        (3, "entirely unique content with no repeats whatsoever here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pre = dedup.duplicate_spans(df, "doc_id", "text", min_len=20)
    a = sorted(
        map(tuple, dedup.duplicate_span_stats(df, "doc_id", "text").collect())
    )
    b = sorted(
        map(
            tuple,
            dedup.duplicate_span_stats(
                df, "doc_id", "text", spans=pre
            ).collect(),
        )
    )
    assert a == b


def test_cut_duplicate_spans_removes_exactly_the_covered_chars(spark):
    """The apply step: cut text = normalized text minus the merged
    duplicated spans; clean docs unchanged; cut length reconciles
    with duplicate_span_stats coverage on every doc."""
    rows = [
        (1, "xx abcdefghijklmnopqrstuvwxyz tail one"),
        (2, "completely other prefix abcdefghijklmnopqrstuvwxyz"),
        (3, "00000000001111111111 mid 00000000001111111111"),
        (4, "qqww eerr ttyy uuii oopp aass ddff gghh jjkk llzz xxcc"),
        (5, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cut = {
        r.doc_id: (r.cut_text, r.n_cut_chars)
        for r in dedup.cut_duplicate_spans(df, "doc_id", "text").collect()
    }
    assert set(cut) == {1, 2, 3, 4, 5}
    stats = {
        r.doc_id: r.dup_chars
        for r in dedup.duplicate_span_stats(df, "doc_id", "text").collect()
    }
    from projet_big_data_boutin_danre_spark.functions.hashing import (
        normalize_text,
    )

    norm = {
        r.doc_id: r.nt
        for r in df.select(
            "doc_id", normalize_text("text").alias("nt")
        ).collect()
    }
    for d in cut:
        text, n = cut[d]
        assert n == stats[d]
        assert len(text) == len(norm[d]) - stats[d]
    # clean docs untouched
    assert cut[4][0] == norm[4] and cut[5][0] == norm[5]
    # doc 3: two exact islands cut -> the middle survives
    assert cut[3][0] == " mid "
    # interior cut keeps both flanks (doc 1: the shared run reaches
    # p=2 — doc 2's "prefix" ends in 'x', extending the window match
    # one char left — so one 'x' survives plus the unique suffix)
    assert cut[1][0] == "x tail one"


def test_cut_duplicate_spans_accepts_precomputed_spans(spark):
    rows = [
        (1, "abcdefghijklmnopqrstuvwxyz and more text here"),
        (2, "abcdefghijklmnopqrstuvwxyz plus other stuff"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pre = dedup.duplicate_spans(df, "doc_id", "text")
    a = sorted(map(tuple, dedup.cut_duplicate_spans(df, "doc_id", "text").collect()))
    b = sorted(
        map(
            tuple,
            dedup.cut_duplicate_spans(df, "doc_id", "text", spans=pre).collect(),
        )
    )
    assert a == b


def test_cut_duplicate_spans_hash_family_parity(spark):
    """cut_duplicate_spans(hash_family=...) must produce IDENTICAL
    cut text across families — the family only narrows the span
    count-window key (the corpus_pipeline threading contract)."""
    rows = [
        (1, "xx abcdefghijklmnopqrstuvwxyz tail one"),
        (2, "completely other prefix abcdefghijklmnopqrstuvwxyz"),
        (3, "00000000001111111111 mid 00000000001111111111"),
        (4, "qqww eerr ttyy uuii oopp aass ddff gghh jjkk llzz xxcc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def cuts(fam):
        return sorted(
            (r.doc_id, r.cut_text, r.n_cut_chars)
            for r in dedup.cut_duplicate_spans(
                df, "doc_id", "text", hash_family=fam
            ).collect()
        )

    assert cuts("md5") == cuts("fast")


def test_cut_duplicate_spans_preserve_original(spark):
    """preserve_original=True: spans detected over the aligned
    (length-preserving) view, cut from the RAW text — casing and
    punctuation survive everywhere outside the removed ranges.
    Pinned against a brute-force pure-Python reference of the same
    windows→count→gaps-and-islands→cut contract."""
    from projet_big_data_boutin_danre_spark.operators.text import (
        normalize_text_aligned_py,
    )

    rows = [
        (1, "Keep Me! Q-abcdefghijklmnopqrstuvwxyz0123456789 Tail#1"),
        (2, "Other start: Q-ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 fin"),
        (3, "Clean DOC: unique punctuation, Casing & all..."),
        (4, "tiny"),
    ]
    min_len = 20

    # reference: global window counts over the aligned view, hit
    # positions merged per doc (break when gap > min_len), spans cut
    # from the ORIGINAL text (1-based inclusive, exactly the operator
    # contract)
    from collections import Counter

    al = {d: normalize_text_aligned_py(t) for d, t in rows}
    assert all(len(al[d]) == len(t) for d, t in rows)  # alignment
    cnt: Counter = Counter()
    wins = {}
    for d, t in al.items():
        ws = (
            [t[i : i + min_len] for i in range(len(t) - min_len + 1)]
            if len(t) >= min_len
            else []
        )
        wins[d] = ws
        cnt.update(ws)
    expected = {}
    for (d, orig) in rows:
        ps = [i + 1 for i, w in enumerate(wins[d]) if cnt[w] >= 2]
        spans, cur, prev = [], None, None
        for p in ps:
            if prev is None or p - prev > min_len:
                if cur:
                    spans.append(cur)
                cur = [p, p]
            else:
                cur[1] = p
            prev = p
        if cur:
            spans.append(cur)
        ranges = [(s, e + min_len - 1) for s, e in spans]
        out, at = [], 1
        for s, e in ranges:
            out.append(orig[at - 1 : s - 1])
            at = e + 1
        out.append(orig[at - 1 :])
        expected[d] = "".join(out)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.cut_text, r.n_cut_chars)
        for r in dedup.cut_duplicate_spans(
            df,
            "doc_id",
            "text",
            min_len=min_len,
            preserve_original=True,
        ).collect()
    }
    for d, orig in rows:
        assert got[d][0] == expected[d]
        assert got[d][1] == len(orig) - len(expected[d])
    # the lossiness regression: clean docs come back byte-for-byte,
    # punctuation and casing intact
    assert got[3][0] == rows[2][1]
    assert got[4][0] == "tiny"
    # cut docs keep their raw flanks (the span extends left through
    # the punctuation-aligned spaces, so only "Keep Me"/"Other start"
    # are guaranteed to survive verbatim)
    assert got[1][0].startswith("Keep Me")
    assert got[2][0].startswith("Other start")


def test_cut_duplicate_spans_alignment_guard(spark):
    """The precomputed-spans alignment contract (r7 verdict #2):
    offsets detected over one text view must never be cut from the
    other. duplicate_spans stamps a span_offsets metadata marker;
    cut_duplicate_spans refuses a contradicting marker, refuses
    unmarked spans without an explicit spans_aligned=True, and
    accepts the matching pairings unchanged."""
    import pytest

    rows = [
        (1, "AA abcdefghijklmnopqrstuvwxyz zz"),
        (2, "BB abcdefghijklmnopqrstuvwxyz yy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    norm_spans = dedup.duplicate_spans(df, "doc_id", "text")
    raw_spans = dedup.duplicate_spans(
        df, "doc_id", "text", preserve_offsets=True
    )

    # markers stamped by detection
    assert (
        norm_spans.schema["span_start"].metadata["span_offsets"]
        == "normalized"
    )
    assert raw_spans.schema["span_start"].metadata["span_offsets"] == "raw"

    # mismatched pairings REFUSED in both directions
    with pytest.raises(ValueError, match="span_offsets='normalized'"):
        dedup.cut_duplicate_spans(
            df, "doc_id", "text", spans=norm_spans, preserve_original=True
        )
    with pytest.raises(ValueError, match="span_offsets='raw'"):
        dedup.cut_duplicate_spans(
            df, "doc_id", "text", spans=raw_spans, preserve_original=False
        )

    # matched pairings accepted, identical to internal detection
    for spans, po in ((norm_spans, False), (raw_spans, True)):
        a = sorted(
            map(
                tuple,
                dedup.cut_duplicate_spans(
                    df, "doc_id", "text", spans=spans, preserve_original=po
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                dedup.cut_duplicate_spans(
                    df, "doc_id", "text", preserve_original=po
                ).collect(),
            )
        )
        assert a == b

    # unmarked spans (hand-built, or rebuilt under a plain schema that
    # dropped the marker): refused without the explicit assertion,
    # accepted with it
    unmarked = spark.createDataFrame(
        norm_spans.collect(), "doc_id long, span_start int, span_end int"
    )
    with pytest.raises(ValueError, match="spans_aligned=True"):
        dedup.cut_duplicate_spans(df, "doc_id", "text", spans=unmarked)
    ok = dedup.cut_duplicate_spans(
        df, "doc_id", "text", spans=unmarked, spans_aligned=True
    )
    assert ok.count() == 2


def test_lsh_bucket_profile_histogram_and_shared_bands(spark):
    """lsh_bucket_profile: exact-duplicate groups share every band
    bucket, so a 3-copy group contributes 4 buckets of size 3 (one
    per band) and 4·C(3,2)=12 within-bucket pair expansions; the
    candidate_pairs total upper-bounds the distinct pair count, and
    the bands_df sharing path returns identical rows."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "the quick brown fox jumps over the lazy dog tonight"),
        (4, "entirely different content about spark partitions here"),
        (5, "entirely different content about spark partitions here"),
        (6, "a third unrelated document with its own words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    prof = {
        r.bucket_size: (r.n_buckets, r.candidate_pairs)
        for r in dedup.lsh_bucket_profile(df, "doc_id", "text").collect()
    }
    # 4 bands: the 3-copy group fills 4 size-3 buckets, the 2-copy
    # group 4 size-2 buckets (distinct texts collide with negligible
    # probability at this scale)
    assert prof[3] == (4, 12)
    assert prof[2] == (4, 4)
    distinct_pairs = dedup.minhash_lsh_pairs(df, "doc_id", "text").count()
    assert distinct_pairs == 4  # C(3,2) + C(2,2)
    assert sum(p for _, p in prof.values()) >= distinct_pairs

    bands = dedup.lsh_bands(
        dedup.minhash_signatures(df, "doc_id", "text", 8, 8), 8, 4
    )
    shared = {
        r.bucket_size: (r.n_buckets, r.candidate_pairs)
        for r in dedup.lsh_bucket_profile(None, bands_df=bands).collect()
    }
    assert shared == prof
    # and the pair path accepts the same precomputed bands
    assert (
        dedup.minhash_lsh_pairs(
            df, "doc_id", "text", bands_df=bands
        ).count()
        == distinct_pairs
    )


def test_top_duplicate_windows_hash_family_parity(spark):
    rows = [
        (1, "xx abcdefghijklmnopqrstuvwxyz tail one"),
        (2, "completely other prefix abcdefghijklmnopqrstuvwxyz"),
        (3, "00000000001111111111 mid 00000000001111111111"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def top(fam):
        return [
            (r.w, r.n_occurrences)
            for r in dedup.top_duplicate_windows(
                df, "text", min_len=20, k=5, hash_family=fam
            ).collect()
        ]

    assert top("md5") == top("fast")


def test_verify_pairs_levenshtein_kills_false_positives(spark):
    """Sketch-then-verify: a blocking stage admits (near-dup, junk)
    candidates; the edit-distance rescore separates them."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated content about parquet files"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    rows = dedup.verify_pairs_levenshtein(
        docs, "doc_id", "text", pairs, prefix_len=100
    ).collect()
    out = {(r.id_a, r.id_b): (r.lev_dist, r.lev_len) for r in rows}
    # nothing here exceeds 100 normalized chars -> no truncation
    assert all(r.lev_truncated is False for r in rows)
    d12, l12 = out[(1, 2)]
    d13, l13 = out[(1, 3)]
    assert d12 == 3  # dog -> cat
    assert 1 - d12 / l12 > 0.9  # real near-dup survives
    assert 1 - d13 / l13 < 0.5  # junk candidate killed
    # bounded prefix: cost cap regardless of doc length
    long_docs = spark.createDataFrame(
        [(1, "a" * 10_000), (2, "a" * 9_000 + "b" * 1_000)],
        "doc_id long, text string",
    )
    r = dedup.verify_pairs_levenshtein(
        long_docs, "doc_id", "text",
        spark.createDataFrame([(1, 2)], "id_a long, id_b long"),
        prefix_len=50,
    ).collect()[0]
    assert r.lev_len == 50 and r.lev_dist == 0  # identical prefixes
    assert r.lev_truncated is True  # the observability counter fires


def test_drop_common_lines_refinedweb_semantics(spark):
    """Corpus-wide line dedup: an exact line in >= min_df distinct
    docs is removed from ALL of them (no keeper — boilerplate has no
    owner); sub-threshold lines and within-doc repeats survive; order
    is preserved; NULL text stays NULL; the census helper returns the
    boilerplate-sized (key, df) set."""
    banner = "COOKIE CONSENT BANNER BOILERPLATE"
    rows = [
        (1, f"{banner}\nunique alpha prose line here\nok"),
        (2, f"{banner}\nanother unique line of text"),
        # within-doc repeat of a LONG line, unique to this doc -> kept
        (3, "this long line repeats inside one doc\n"
            "this long line repeats inside one doc"),
        (4, None),
        (5, ""),
        # short duplicate line (< min_len) across docs -> never a
        # candidate
        (6, "short dup\nreal content sentence that stays"),
        (7, "short dup\nother real content that stays"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.drop_common_lines(
            df, "doc_id", "text", min_df=2, min_len=15
        ).collect()
    }
    assert out[1]["kept_text"] == "unique alpha prose line here\nok"
    assert out[1]["n_lines_dropped"] == 1
    assert out[2]["kept_text"] == "another unique line of text"
    # df counts DISTINCT docs: the in-doc repeat has df=1 -> kept
    assert out[3]["n_lines_dropped"] == 0
    assert out[3]["kept_text"].count("repeats inside") == 2
    assert out[4]["kept_text"] is None and out[4]["n_lines_dropped"] == 0
    assert out[5]["kept_text"] == ""
    assert "short dup" in out[6]["kept_text"]
    assert "short dup" in out[7]["kept_text"]
    # census: exactly one common line, df=2
    cl = dedup.common_lines(df, "doc_id", "text", min_df=2, min_len=15)
    assert [(r["line_df"],) for r in cl.collect()] == [(2,)]
    # precomputed census short-circuits identically
    pre = {
        r["doc_id"]: r["kept_text"]
        for r in dedup.drop_common_lines(
            df, "doc_id", "text", min_df=2, min_len=15, common=cl
        ).collect()
    }
    assert pre == {k: v["kept_text"] for k, v in out.items()}


def test_c4_sentence_dedup_keeps_globally_first_occurrence(spark):
    """C4 §2.2: a three-sentence span occurring twice survives only
    in the globally-first doc; sub-window docs and NULL text pass
    through; overlapping duplicated windows merge into one cut; the
    cut is char-exact (offsets index the raw text)."""
    shared = (
        "First shared sentence here. Second shared one too! "
        "Third shared closes it? "
    )
    rows = [
        (2, shared + "Unique tail for doc two."),
        (1, shared + "Different unique tail for one."),
        (3, "Only two sentences. Not enough here."),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.c4_sentence_dedup(df, "doc_id", "text").collect()
    }
    # keeper = min (doc_id, start): doc 1 keeps, doc 2 is cut
    assert out[1]["cut_text"].startswith("First shared")
    assert out[1]["n_cut_chars"] == 0
    assert "shared" not in out[2]["cut_text"]
    assert out[2]["cut_text"].endswith("Unique tail for doc two.")
    assert out[2]["n_cut_chars"] == len(shared) - 1  # trailing space
    # starts the NEXT sentence, so it survives the cut
    assert out[3]["n_cut_chars"] == 0
    assert out[4]["cut_text"] is None and out[4]["n_cut_chars"] == 0
    # four shared sentences -> two overlapping dup windows merge into
    # ONE contiguous cut (union-of-ranges), so everything shared goes
    shared4 = shared + "Fourth shared extends the run. "
    df2 = spark.createDataFrame(
        [(1, shared4 + "Alpha tail."), (2, shared4 + "Beta tail.")],
        "doc_id long, text string",
    )
    o2 = {
        r["doc_id"]: r.asDict()
        for r in dedup.c4_sentence_dedup(df2, "doc_id", "text").collect()
    }
    assert o2[1]["n_cut_chars"] == 0
    assert o2[2]["cut_text"].strip() == "Beta tail."
    # segmentation is exhaustive: sentences concatenate to the input
    from pyspark.sql import functions as F

    back = df.filter("text IS NOT NULL").select(
        "text",
        F.concat_ws(
            "",
            F.regexp_extract_all(
                "text", F.lit(dedup.SENTENCE_RE), F.lit(0)
            ),
        ).alias("re"),
    )
    assert back.filter("text <> re").count() == 0


def test_ngram_jaccard_max_block_guard(spark):
    """The hot-block guard: an oversized block keeps only its
    max_block smallest ids (no fabricated keeper pairs — this
    operator emits SIMILARITIES); other blocks are untouched, and the
    capped result equals running uncapped on the truncated input."""
    rows = [(i, "common shared gram text body", "hot") for i in range(1, 7)]
    rows += [(10, "other niche content alpha", "cold"),
             (11, "other niche content alpha", "cold")]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", "src", n=3, max_block=3
        ).collect()
    }
    # hot block: all-pairs among {1,2,3} only; cold block unaffected
    assert capped == {(1, 2), (1, 3), (2, 3), (10, 11)}
    truncated = df.filter("doc_id <= 3 OR src = 'cold'")
    uncapped = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            truncated, "doc_id", "text", "src", n=3
        ).collect()
    }
    assert capped == uncapped


def test_connected_components_mixed_id_types_refused(spark):
    """Mixed-type edge columns (long id_a, string id_b) would build
    the dense dictionary typed from one column while unionByName
    coerces to the wider type — a silent mistype. Both endpoints of
    an undirected edge draw from ONE id domain, so the mismatch is a
    caller bug and must fail loudly (r12 advisor)."""
    import pytest

    df = spark.createDataFrame(
        [(1, "doc-2"), (2, "doc-3")], "id_a long, id_b string"
    )
    with pytest.raises(TypeError, match="share one id type"):
        dedup.connected_components(df)
    # both-non-integral but different types is the same caller bug
    df2 = spark.createDataFrame(
        [("a", 1.5)], "id_a string, id_b double"
    )
    with pytest.raises(TypeError, match="share one id type"):
        dedup.connected_components(df2)


def test_connected_components_small_graph_path_matches_loop(spark):
    """r19: the bounded driver-side union-find shortcut must be
    row-identical to the distributed star loop (same (node, component)
    mapping, component = min reachable id), report rounds=0 +
    small_graph_edges, and defer to the loop when the edge count
    exceeds the threshold."""
    rng = random.Random(19)
    edges = [
        (rng.randrange(1, 400), rng.randrange(1, 400)) for _ in range(700)
    ] + [(i, i + 1) for i in range(500, 560)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    st_small: dict = {}
    small = {
        (r["node"], r["component"])
        for r in dedup.connected_components(df, stats=st_small).collect()
    }
    st_loop: dict = {}
    loop = {
        (r["node"], r["component"])
        for r in dedup.connected_components(
            df, stats=st_loop, small_graph_threshold=None
        ).collect()
    }
    assert small == loop
    assert st_small["rounds"] == 0
    assert st_small["small_graph_edges"] > 0
    assert st_loop["rounds"] >= 1
    # threshold below the edge count -> the loop runs (rounds >= 1)
    st_forced: dict = {}
    forced = {
        (r["node"], r["component"])
        for r in dedup.connected_components(
            df, stats=st_forced, small_graph_threshold=5
        ).collect()
    }
    assert forced == loop
    assert st_forced["rounds"] >= 1
