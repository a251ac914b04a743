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
  pair ∈ {lsh, lsh_sig, span, span_cut}
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
