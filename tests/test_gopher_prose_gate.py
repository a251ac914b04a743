"""The Gopher gate on PROSE-REALISTIC input (r10, judge item #2).

The driver's synthetic documents are stop-word-free word bags — 0/500
pass Rae et al.'s 2-stop-word floor, so every earlier probe pinned
``gopher_min_stop_hits=0`` and the composite ``gopher_pass`` verdict
had never fired end-to-end at its paper defaults. This battery builds
the deterministic stopword-bearing prose fixture (FIXTURES.md §5):
seeded mixing of the 8 Gopher stop words into word bags at per-doc
rates chosen so the stop-word floor BITES — some docs carry none, some
exactly one, most a healthy sprinkle — and asserts a non-degenerate
pass rate at paper defaults both at the operator and through the
corpus-pipeline gate stage.
"""

from __future__ import annotations

import random
import re

import pytest

GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

_VOCAB = (
    "market signal filter window stream values report stable metric "
    "sample vector column schema branch merge saddle lattice kernel"
).split()


def prose_rows(n: int = 120, seed: int = 42) -> list[tuple[int, str]]:
    """Deterministic prose fixture: doc ``i`` is 55-90 vocabulary
    words with stop words mixed in by residue class — ``i%4==0`` none
    (fails the floor), ``i%4==1`` exactly one (still fails the
    2-distinct floor unless the single word repeats — it can't, one
    position), ``i%4 in {2,3}`` one stop word every 7th position
    (passes). Every other Table A1 rule is satisfied by construction
    (all-alpha words of length 2-7, no bullets/ellipses/symbols), so
    the stop-word floor is the deciding rule."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        n_words = rng.randint(55, 90)
        words = [rng.choice(_VOCAB) for _ in range(n_words)]
        if i % 4 == 1:
            words[3] = rng.choice(GOPHER_STOPS)
        elif i % 4 >= 2:
            for k in range(0, n_words, 7):
                words[k] = rng.choice(GOPHER_STOPS)
        rows.append((i, " ".join(words)))
    return rows


def _expected_pass(rows, min_stop_hits: int = 2) -> set[int]:
    """Independent Python adjudication of the stop-word floor (the
    only rule the fixture lets vary)."""
    out = set()
    for i, t in rows:
        hits = sum(
            1 for s in GOPHER_STOPS if re.search(rf"\b{s}\b", t)
        )
        if hits >= min_stop_hits:
            out.add(i)
    return out


def test_gopher_gate_fires_at_paper_defaults(spark):
    from projet_big_data_boutin_danre_spark.operators import text as t

    rows = prose_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in t.gopher_rules(df, "doc_id", "text").collect()
    }
    passed = {i for i, r in got.items() if r["gopher_pass"]}
    # non-degenerate: the gate actually separates prose from spam at
    # the PAPER defaults (min_stop_hits=2) — neither all-pass nor
    # all-fail
    assert 0 < len(passed) < len(rows)
    assert passed == _expected_pass(rows)
    # the residue-class design holds: stop-free docs all fail, and
    # every failing doc fails ONLY the stop-word floor (the other
    # signals are in-bounds by construction)
    for i, r in got.items():
        if i % 4 == 0:
            assert not r["gopher_pass"] and r["g_stop_hits"] == 0
        if not r["gopher_pass"]:
            assert r["g_stop_hits"] < 2
            assert 50 <= r["g_words"] <= 100_000
            assert 3 * r["g_words"] <= r["g_word_chars"] <= 10 * r["g_words"]
            assert r["g_alpha_words"] == r["g_words"]


def test_pipeline_gopher_gate_end_to_end(spark, tmp_path):
    """The corpus-pipeline gate stage with gopher=True at the paper
    stop-word floor: a strict, non-empty subset survives, and the
    survivors are exactly the operator-level pass set."""
    from projet_big_data_boutin_danre_spark.corpus_pipeline import (
        CorpusRecipe,
        run_corpus_pipeline,
    )
    from pyspark.sql import functions as F

    rows = prose_rows(n=60, seed=7)
    docs = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("prose").alias("source"),
        F.length("text").alias("n_chars"),
    )
    root = str(tmp_path / "prose_lake")
    recipe = CorpusRecipe(gopher=True)  # paper defaults: floor = 2
    counts = run_corpus_pipeline(spark, docs, root, recipe)
    expected = _expected_pass(rows)
    assert 0 < len(expected) < len(rows)
    assert counts["gated"] == len(expected)
    gated_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{root}/gated").collect()
    }
    assert gated_ids == expected
