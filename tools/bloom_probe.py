"""Bloom admission A/B (r10): does the bloom_guard fast path pay for
itself on a mostly-novel batch, and how much of the batch does it
prove new without touching the exact sidecar?

Protocol: seed a lake with the first half of the sf documents, then
ingest the second half plus a 10% duplicate tail (content re-sent
under new ids — the steady-state shape of a crawl), with and without
``bloom_guard``, fresh lake each arm, interleaved (ABBA) wall times.
Admission counts must match exactly between arms (the filter has no
false negatives; false positives only re-route through the exact
join).

At sf0.1 both arms are driver-action-bound (the batch is tiny next
to the per-job overhead — the known test-scale regime, BASELINE.md),
so read the ``bloom_fastpath`` fraction as the scale signal and the
wall clock as a sanity bracket, not a verdict: at 100 TB the avoided
work is the per-batch exact anti-join against a corpus-sized-sidecar,
which this scale cannot price.

Usage: python tools/bloom_probe.py [sf_dir]
Output: markdown + one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.corpus_pipeline import (
    incremental_ingest,
)
from projet_big_data_boutin_danre_spark.session import get_spark
from projet_big_data_boutin_danre_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bloom_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    n = docs.count()
    half = n // 2
    b1 = docs.filter(F.col("doc_id") % 2 == 0).persist()
    dup_tail = (
        docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 10 == 0))
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    b2 = (
        docs.filter(F.col("doc_id") % 2 == 1).unionByName(dup_tail).persist()
    )
    b1.count(), b2.count()

    results: dict[str, dict] = {}
    base = tempfile.mkdtemp(prefix="bloom_probe_")
    try:
        for trial, guard in enumerate([True, False, False, True]):
            name = "bloom" if guard else "plain"
            root = f"{base}/lake_{trial}"
            incremental_ingest(spark, b1, root, bloom_guard=guard)
            t0 = time.time()
            r2 = incremental_ingest(spark, b2, root, bloom_guard=guard)
            dt = time.time() - t0
            slot = results.setdefault(
                name, {"batch2_sec": [], "admitted": r2["admitted"]}
            )
            slot["batch2_sec"].append(round(dt, 2))
            assert slot["admitted"] == r2["admitted"]
            if guard:
                slot["fastpath"] = r2["bloom_fastpath"]
                slot["batch2_arrived"] = b2.count()
    finally:
        shutil.rmtree(base, ignore_errors=True)

    assert results["bloom"]["admitted"] == results["plain"]["admitted"]
    fp = results["bloom"]["fastpath"]
    arr = results["bloom"]["batch2_arrived"]
    print(f"\n## bloom_guard admission A/B ({n} docs, batch2={arr})\n")
    print("| arm | batch2 min wall | admitted | fastpath |")
    print("|---|---|---|---|")
    for name, r in results.items():
        fpc = f"{r.get('fastpath', '—')}"
        print(
            f"| {name} | {min(r['batch2_sec'])}s | {r['admitted']} | {fpc} |"
        )
    print(
        f"\nfastpath fraction: {fp}/{arr} = {fp / arr:.1%} of the batch "
        "proven new without the exact sidecar join\n"
    )
    print(
        json.dumps(
            {"metric": "bloom_admission_ab", "results": results, "n": n}
        )
    )


if __name__ == "__main__":
    main()
