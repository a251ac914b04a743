"""Order-bias-free A/B perf adjudicator for hash-family (and similar)
pairs: the protocol that settled the r6/r7 span-family question, as a
reusable tool.

Why it exists: single-run probe pairs lie. Whichever family runs first
absorbs JVM/codegen warmup and loses (this inverted the r6 span
verdict, then inverted the r7 `lsh_pairs_{md5,fast}` bench pair the
other way). The fix is structural, not statistical patience:

- JOINT warmup: one untimed run of each candidate before any timing,
  so codegen/page-cache costs are paid outside the measurement.
- INTERLEAVED order A B B A B A A B: each candidate runs 4 times, in
  mirrored positions, so residual drift cancels instead of biasing
  one side.
- min-of-4 per candidate: host-load noise only ever ADDS time, so the
  minimum is the best estimate of the plan's true cost.

Run at several data volumes (k shifted copies of the sf docs table,
same generator as tools/scale_probe.py) to see crossovers instead of
a single-point verdict.

Usage: python tools/ab_probe.py <pair> [sf_dir] [max_k]
  pair ∈ {lsh, lsh_sig, span, span_cut, dedup_views}
Output: one markdown table (k × candidate minima) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.operators import dedup
from projet_big_data_boutin_danre_spark.session import get_spark
from projet_big_data_boutin_danre_spark.sources.readers import load_table
from tools.scale_probe import scaled

# each pair: name -> (candidate -> docs-frame thunk factory). The
# thunk must force FULL execution (count()).
PAIRS = {
    # minhash_lsh_pairs: "fast" replaces the md5-hex signature/band
    # strings with xxhash64 longs — groupBy dedup shape WITH map-side
    # partial aggregation (unlike the span count window), so the
    # narrowing story is not automatically the same as span's.
    "lsh": {
        "md5": lambda docs: lambda: dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", hash_family="md5"
        ).count(),
        "fast": lambda docs: lambda: dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", hash_family="fast"
        ).count(),
    },
    # signature stage alone (localizes the lsh crossover: is it the
    # min-aggregate + hashing, or the bucket/pair fan-out?). The
    # max(sig_7) forcing keeps Catalyst from pruning the min aggs a
    # bare count() wouldn't execute; identical overhead both sides.
    "lsh_sig": {
        "md5": lambda docs: lambda: dedup.minhash_signatures(
            docs, "doc_id", "text", hash_family="md5"
        ).select(F.max("sig_7")).collect(),
        "fast": lambda docs: lambda: dedup.minhash_signatures(
            docs, "doc_id", "text", hash_family="fast"
        ).select(F.max("sig_7")).collect(),
    },
    # duplicate_spans count-window key families (the r7 adjudication,
    # kept re-runnable)
    "span": {
        "md5": lambda docs: lambda: dedup.duplicate_spans(
            docs, "doc_id", "text", hash_family="md5"
        ).count(),
        "fast": lambda docs: lambda: dedup.duplicate_spans(
            docs, "doc_id", "text", hash_family="fast"
        ).count(),
    },
    # the PRODUCTION span-cut path (detection over the aligned view +
    # raw-text HOF fold) vs detection alone — measures what the cut
    # stage ADDS (spans rollup join + per-row fold). The cut side is
    # forced through sum(length(cut_text)): a bare count() lets the
    # optimizer DELETE the whole spans subplan (left join on unique
    # groupBy keys with no referenced columns is provably
    # row-preserving), which timed as an empty docs scan.
    "span_cut": {
        "detect_only": lambda docs: lambda: dedup.duplicate_spans(
            docs, "doc_id", "text", hash_family="fast",
            preserve_offsets=True,
        ).count(),
        "detect_and_cut": lambda docs: lambda: dedup.cut_duplicate_spans(
            docs, "doc_id", "text", hash_family="fast",
            preserve_original=True,
        )
        .select(
            F.sum(F.length("cut_text")).alias("a"),
            F.sum("n_cut_chars").alias("b"),
        )
        .collect(),
    },
}


def _exact_dedup_union(docs, share: bool):
    """The exact_dedup slot's six-tag union (mirrors
    __spark_entry__.q_exact_dedup), parameterized on the r10 question:
    ``share=True`` checkpoints ONE normalized corpus (text + the
    newline and sentence views) and lets every tag read it;
    ``share=False`` is the shipped shape (each tag derives its view
    from the docs scan; only the span subplan is checkpointed)."""
    nl = F.regexp_replace(F.col("text"), r"((?:\S+ ){4}\S+) ", "$1\n")
    sv = F.regexp_replace(F.col("text"), r"((?:\S+ ){5}\S+) ", "$1. ")
    if share:
        base = docs.select(
            "doc_id", "text", nl.alias("__nl"), sv.alias("__sv")
        ).localCheckpoint()
    else:
        base = docs.select(
            "doc_id", "text", nl.alias("__nl"), sv.alias("__sv")
        )
    groups = dedup.exact_dedup_stats(base, "doc_id", "text").select(
        F.lit("group").alias("tag"),
        F.col("content_hash").alias("key"),
        F.col("keeper_id").alias("v1"),
        F.col("n_copies").alias("v2"),
    )
    spans_df = dedup.duplicate_spans(
        base, "doc_id", "text", min_len=20
    ).localCheckpoint(eager=False)
    spans = spans_df.select(
        F.lit("span").alias("tag"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("span_start").alias("v1"),
        F.col("span_end").alias("v2"),
    )
    cover = (
        dedup.duplicate_span_stats(
            base, "doc_id", "text", min_len=20, spans=spans_df
        )
        .filter(F.col("n_dup_spans") > 0)
        .select(
            F.lit("cover").alias("tag"),
            F.col("doc_id").cast("string").alias("key"),
            F.col("n_dup_spans").alias("v1"),
            F.col("dup_chars").alias("v2"),
        )
    )
    topwin = dedup.top_duplicate_windows(
        base, "text", min_len=20, k=15
    ).select(
        F.lit("topwin").alias("tag"),
        F.col("w").alias("key"),
        F.col("n_occurrences").alias("v1"),
        F.lit(None).cast("bigint").alias("v2"),
    )
    lines_tag = dedup.drop_common_lines(
        base.select("doc_id", "__nl"), "doc_id", "__nl",
        min_df=2, min_len=15,
    ).select(
        F.lit("lines").alias("tag"),
        F.md5(F.coalesce("kept_text", F.lit(""))).alias("key"),
        F.col("doc_id").alias("v1"),
        F.col("n_lines_dropped").cast("bigint").alias("v2"),
    )
    c4 = dedup.c4_sentence_dedup(
        base.select("doc_id", "__sv"), "doc_id", "__sv"
    ).select(
        F.lit("c4").alias("tag"),
        F.md5(F.coalesce("cut_text", F.lit(""))).alias("key"),
        F.col("doc_id").alias("v1"),
        F.col("n_cut_chars").cast("bigint").alias("v2"),
    )
    return (
        groups.unionByName(spans).unionByName(cover).unionByName(topwin)
        .unionByName(lines_tag).unionByName(c4)
    )


# r10 verdict item #4: does checkpointing the normalized corpus once
# (shared by all six exact_dedup tags) beat the shipped
# derive-per-tag shape? Forced like the graded bench (count()) so the
# verdict speaks to the graded number.
PAIRS["dedup_views"] = {
    "as_is": lambda docs: lambda: _exact_dedup_union(docs, False).count(),
    "shared_ckpt": lambda docs: lambda: _exact_dedup_union(
        docs, True
    ).count(),
}

ORDER = "ABBABAAB"  # mirrored positions: drift cancels


def adjudicate(pair: str, sf_dir: str, max_k: int) -> dict:
    spark = get_spark(f"ab_probe_{pair}")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, sf_dir, "documents")
    n_docs = docs0.count()
    ks = [k for k in (1, 4, 16, 32) if k <= max_k]
    (a_name, a_fac), (b_name, b_fac) = PAIRS[pair].items()

    results: dict[int, dict[str, float]] = {}
    for k in ks:
        docs = scaled(docs0, "doc_id", k, n_docs).persist()
        docs.count()  # materialize outside timings
        a, b = a_fac(docs), b_fac(docs)
        a(), b()  # joint warmup, untimed
        best = {a_name: float("inf"), b_name: float("inf")}
        for c in ORDER:
            fn, nm = (a, a_name) if c == "A" else (b, b_name)
            t0 = time.time()
            fn()
            best[nm] = min(best[nm], time.time() - t0)
        results[k] = {n: round(t, 3) for n, t in best.items()}
        docs.unpersist()

    print(f"\n| k | {a_name} | {b_name} | delta |")
    print("|---|---|---|---|")
    for k in ks:
        ta, tb = results[k][a_name], results[k][b_name]
        d = (tb - ta) / min(ta, tb) * 100
        print(f"| {k}x | {ta:.2f} s | {tb:.2f} s | {d:+.0f}% |")
    out = {"pair": pair, "sf_dir": sf_dir, "order": ORDER,
           "min_of": ORDER.count("A"), "results": results}
    print()
    print(json.dumps(out))
    return out


def main() -> None:
    pair = sys.argv[1] if len(sys.argv) > 1 else "lsh"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    max_k = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    adjudicate(pair, sf_dir, max_k)


if __name__ == "__main__":
    main()
