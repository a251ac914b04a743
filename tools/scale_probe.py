"""Empirical scaling probe: time the core corpus operators at 1x, 2x,
4x, 8x the sf0.1 data volume and report the scaling exponent — the
measured counterpart to SCALE.md's per-operator claims (near-linear =
the plan has no quadratic blow-up hiding behind small-sf timings).

Scaled inputs are k shifted copies of the driver's documents /
embeddings tables (ids offset so dedup/similarity semantics stay
non-degenerate: copies are EXACT duplicates content-wise, which is the
worst case for dedup fan-out). Bench-side measurement only — never a
correctness input.

Usage: python tools/scale_probe.py [sf_dir] [max_k]
Output: one markdown table + a JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from projet_big_data_boutin_danre_spark.operators import (
    bpe,
    corpus_prep,
    dedup,
    lm,
    quantize,
    text,
)
from projet_big_data_boutin_danre_spark.session import get_spark
from projet_big_data_boutin_danre_spark.sources.readers import load_table


def scaled(df: DataFrame, id_col: str, k: int, stride: int) -> DataFrame:
    """k shifted copies via crossJoin(range(k)) — one plan node at any
    k (a k-way union would bloat the plan), then repartition so the
    copies spread across partitions like organically-grown data."""
    spark = df.sparkSession
    copies = spark.range(k).select(F.col("id").alias("__copy"))
    out = (
        df.crossJoin(F.broadcast(copies))
        .withColumn(id_col, F.col(id_col) + F.col("__copy") * F.lit(stride))
        .drop("__copy")
    )
    return out.repartition(32)


def probes(docs: DataFrame, emb: DataFrame) -> dict[str, callable]:
    q = emb.filter(F.col("vec_id") % 997 == 0)  # fixed small query set
    return {
        "exact_dedup": lambda: dedup.exact_dedup_stats(
            docs, "doc_id", "text"
        ).count(),
        "minhash_lsh": lambda: dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", scale_profile="production"
        ).count(),
        "simhash": lambda: dedup.simhash(docs, "doc_id", "text").count(),
        "text_profile": lambda: text.text_profile(
            docs, "doc_id", "text", include_pii=True
        ).count(),
        "strat_sample": lambda: corpus_prep.stratified_sample(
            docs, "doc_id", "lang", {"en": 0.5, "fr": 0.25},
            default_fraction=0.1,
        ).count(),
        "domain_mix": lambda: corpus_prep.domain_mix(
            docs, "doc_id", "lang", {"en": 1000, "fr": 500}
        ).count(),
        "interleave": lambda: corpus_prep.interleave(
            docs.select("doc_id", "lang"), "doc_id"
        ).count(),
        "sq8_topk": lambda: quantize.sq8_cosine_topk_rescored(
            emb, q, k=5, shortlist_mult=4
        ).count(),
        "chunk_tokens": lambda: text.chunk_tokens(
            docs, "doc_id", "text", chunk_tokens=64, overlap=8
        ).count(),
        # pairs → clusters: candidate generation scales with the
        # corpus; the star-contraction rounds scale with log²(n), so
        # the measured exponent should stay near the pairs exponent
        "dedup_clusters": lambda: dedup.dedup_clusters(
            docs, "doc_id", "text", scale_profile="production",
            hash_family="fast",
        ).count(),
        "pack_sequences": lambda: corpus_prep.pack_sequences(
            docs.select(
                "doc_id", F.length("text").alias("tk")
            ),
            "doc_id", "tk", budget=4096,
        ).count(),
        # LM: train (wordcount shuffle — model-sized output since
        # copies add no vocabulary) + broadcast-model scoring; the
        # corpus-sized work is two gram scans -> expect ~linear
        "lm_score": lambda: _lm_score(docs),
        # the self-trained corpus-sized-model fallback: scoring
        # shuffle-joins grams against the model on (ctx, w) instead
        # of broadcasting — the path a pruned-but-still-huge model
        # takes; exponent should stay ~linear (hash join both sides)
        "lm_score_shuffle": lambda: _lm_score(docs, broadcast=False),
        # span hash-family adjudication (r6 verdict #1): the count
        # window gets NO map-side partial aggregation, so the key
        # width story must be measured, not asserted — md5 = raw
        # 20-char substring key, fast = two flat xxhash64 longs
        "span_md5": lambda: dedup.duplicate_spans(
            docs, "doc_id", "text", hash_family="md5"
        ).count(),
        "span_fast": lambda: dedup.duplicate_spans(
            docs, "doc_id", "text", hash_family="fast"
        ).count(),
        # the PRODUCTION span-cut path as the corpus_pipeline ships it
        # (r7 verdict #3): aligned-view detection (preserve_offsets)
        # + spans rollup join + raw-text HOF fold — everything the
        # cut stage adds on top of span detection; expect the span
        # detection exponent plus a near-constant fold overhead.
        # Forced via sum(length(cut_text)) — a bare count() lets the
        # optimizer delete the row-preserving left join and with it
        # the entire spans subplan.
        "span_cut": lambda: dedup.cut_duplicate_spans(
            docs, "doc_id", "text", hash_family="fast",
            preserve_original=True,
        )
        .select(F.sum(F.length("cut_text")), F.sum("n_cut_chars"))
        .collect(),
        # BPE: histogram (corpus-sized wordcount, constant vocab) +
        # constant merge loop + map-only Arrow encode -> ~linear
        "bpe_encode": lambda: _bpe_encode(docs),
        "doc_keywords": lambda: text.doc_keywords(
            docs, "doc_id", "text", k=3
        ).count(),
        # candidate-volume diagnostic (r8): same shingle→sig→band
        # subplan as minhash_lsh, two map-side-combining aggs on top
        # — exponent should track minhash_lsh's
        "lsh_bucket_profile": lambda: dedup.lsh_bucket_profile(
            docs, "doc_id", "text", hash_family="fast"
        ).count(),
        # approx mode (the 100 TB path): GK-summary bounds + broadcast
        # filter-back -> map-dominated, ~linear
        "length_trim": lambda: text.length_trim(
            docs, "text", "lang", approx=True
        ).count(),
        # per-group cap, hot-group mitigation (r8): lang is the skewed
        # group here (en ≈ half the corpus and grows with k — windows
        # get NO AQE skew split, so en's sort rides one reducer on the
        # plain path). prefilter=True pre-shrinks every group's sort
        # input to ~4·cap rows; the residual linear cost is the count
        # agg + Bernoulli filter scans, so the GAP between the two
        # rows is the measured value of the mitigation
        # forced via sum(length(text)): a bare count() lets Catalyst
        # prune text out of the window shuffle, hiding the prefilter's
        # main scale win (rows drop BEFORE the text-carrying exchange)
        "cap_plain": lambda: corpus_prep.cap_per_group(
            docs, "doc_id", "lang", 50
        )
        .select(F.sum(F.length("text")))
        .collect(),
        "cap_prefilter": lambda: corpus_prep.cap_per_group(
            docs, "doc_id", "lang", 50, prefilter=True
        )
        .select(F.sum(F.length("text")))
        .collect(),
        # corpus-wide line dedup (r9): census shuffles (md5, id) pairs
        # only, drops come back as per-doc position arrays, rebuild is
        # a map-side HOF — the probe's k exact copies make EVERY line
        # corpus-common (worst case: all positions drop). Forced via
        # sum(length(kept_text)) so the rebuild isn't pruned.
        "line_dedup": lambda: dedup.drop_common_lines(
            docs, "doc_id", "text", min_df=2, min_len=15
        )
        .select(F.sum(F.length("kept_text")), F.sum("n_lines_dropped"))
        .collect(),
        # C4 three-sentence-span dedup (r9): k exact copies are the
        # worst case (every window corpus-duplicated, every non-first
        # occurrence cut). The global keeper rank shuffles (md5 key,
        # id, offsets) — never span text; forced via
        # sum(length(cut_text)) so the fold executes. Sentence view:
        # a '.' after every 6th word, derived in the probe.
        "c4_dedup": lambda: dedup.c4_sentence_dedup(
            docs.select(
                "doc_id",
                F.regexp_replace(
                    F.col("text"), r"((?:\S+ ){5}\S+) ", "$1. "
                ).alias("text"),
            ),
            "doc_id",
            "text",
        )
        .select(F.sum(F.length("cut_text")), F.sum("n_cut_chars"))
        .collect(),
        # composed cap→split recipe path (r8 verdict #7): the recipe
        # wiring runs cap_per_group(prefilter=True) then
        # leakage_safe_split back-to-back; probed here with a
        # full-corpus exact-fingerprint cluster map (the graded slot's
        # shape) so every composed stage scales with k — the cap's
        # count-join + Bernoulli scans + window, the map
        # canonicalization groupBy + fixpoint probe round (r9), and
        # the corpus⋈map split join. Forced via sum(length(text)) +
        # a split-referencing count so neither the window output nor
        # the assignment column is pruned.
        "cap_split": lambda: _cap_split(docs),
        # cross-corpus near-dup probe (r8): HISTORY scales with k, the
        # arriving batch stays fixed (first 200 base ids) — the claim
        # is one linear scan of the growing band layer with the batch
        # broadcast, so the exponent should sit near the scan's
        "lsh_seen": lambda: dedup.lsh_seen_ids(
            docs.filter(F.col("doc_id") < 200),
            dedup.lsh_bands(
                dedup.minhash_signatures(
                    docs, "doc_id", "text", hash_family="fast"
                ),
                hash_family="fast",
            ),
            "doc_id",
            "text",
            hash_family="fast",
        ).count(),
    }


def _cap_split(docs: DataFrame) -> None:
    from projet_big_data_boutin_danre_spark.functions.hashing import (
        stable_fingerprint,
    )

    capped = corpus_prep.cap_per_group(
        docs, "doc_id", "source", 50, prefilter=True
    )
    fps = docs.select("doc_id", stable_fingerprint("text").alias("__fp"))
    reps = fps.groupBy("__fp").agg(F.min("doc_id").alias("rep"))
    members = fps.join(reps, "__fp").select(
        F.col("doc_id").alias("member"), "rep"
    )
    corpus_prep.leakage_safe_split(
        capped, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05},
        members=members,
    ).select(
        F.sum(F.length("text")).alias("b"),
        F.count(F.when(F.col("split") == "train", 1)).alias("n"),
    ).collect()


def _lm_score(docs: DataFrame, broadcast: bool = True) -> int:
    grams = lm.doc_ngrams(docs, ["doc_id"], "text", 2)
    counts = lm.ngram_counts(None, grams=grams)
    model = counts.filter(F.col("c") >= 2)
    ctx = lm.context_totals(None, counts=counts)
    return lm.score_documents(
        docs, "doc_id", "text", model, ctx,
        broadcast_model=broadcast, with_ppl=False, grams=grams,
    ).count()


def _bpe_encode(docs: DataFrame) -> int:
    merges = bpe.train_bpe(
        bpe.word_histogram(docs, "text", max_words=50_000), n_merges=32
    )
    return bpe.encode(docs, "doc_id", "text", merges).count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # optional 3rd arg: comma-separated probe names to run (default
    # all) — lets a single-question re-measure skip the full sweep
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    ks = [k for k in (1, 4, 16, 32, 64, 128) if k <= max_k]
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = load_table(spark, sf_dir, "documents")
    emb0 = load_table(spark, sf_dir, "embeddings")
    n_docs = docs0.count()
    n_emb = emb0.count()

    results: dict[str, dict[int, float]] = {}
    for k in ks:
        docs = scaled(docs0, "doc_id", k, n_docs).persist()
        emb = scaled(emb0, "vec_id", k, n_emb).persist()
        docs.count(), emb.count()  # materialize once, outside timings
        for name, fn in probes(docs, emb).items():
            if only is not None and name not in only:
                continue
            fn()  # warm (codegen + exchange reuse)
            t0 = time.time()
            fn()
            results.setdefault(name, {})[k] = round(time.time() - t0, 3)
        docs.unpersist(), emb.unpersist()

    # scaling exponent: slope of log(t) vs log(k) between first/last k
    print(f"\n| operator | " + " | ".join(f"{k}x" for k in ks) + " | exponent |")
    print("|---" * (len(ks) + 2) + "|")
    exps = {}
    for name, ts in results.items():
        k0, k1 = ks[0], ks[-1]
        exp = (
            math.log(max(ts[k1], 1e-3) / max(ts[k0], 1e-3))
            / math.log(k1 / k0)
            if k1 > k0
            else float("nan")
        )
        exps[name] = round(exp, 2)
        row = " | ".join(f"{ts[k]:.2f}" for k in ks)
        print(f"| {name} | {row} | {exps[name]} |")
    print()
    print(json.dumps({"sf_dir": sf_dir, "ks": ks, "timings": results,
                      "exponents": exps}))


if __name__ == "__main__":
    main()
