"""Per-query profiling harness for the r19 optimization round.

Bench-methodology timings (same warmup as bench.py, same count()
action) but iterated: each named query runs COLD once then N warm
passes; prints one JSON line with cold + warm-min + warm-all.

Usage: python tools/profile_r19.py [-n WARM] query [query ...]
       python tools/profile_r19.py all          # every declared query
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from projet_big_data_boutin_danre_spark.session import get_spark


def warmup(spark, sf_dir, qs, names):
    from pyspark.sql import functions as F

    from projet_big_data_boutin_danre_spark.sources.readers import load_table

    qs[names[0]](spark, sf_dir).limit(1).count()
    spark.createDataFrame([(1,)], "k int").groupBy("k").applyInPandas(
        lambda pdf: pdf, "k int"
    ).count()
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers).repartition(n_workers).mapInPandas(
        lambda it: it, "id long"
    ).count()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        try:
            df = load_table(spark, sf_dir, t)
            df.select(
                [F.count(c).alias(f"c{i}") for i, c in enumerate(df.columns)]
            ).collect()
        except Exception:
            pass


def main() -> None:
    args = sys.argv[1:]
    warm_n = 2
    if args and args[0] == "-n":
        warm_n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_r19")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = list(qs) if args == ["all"] else args
    warmup(spark, sf_dir, qs, list(qs))
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        cold = time.time() - t0
        warms = []
        for _ in range(warm_n):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            warms.append(round(time.time() - t0, 3))
        out[name] = {
            "cold": round(cold, 3),
            "warm_min": round(min(warms), 3) if warms else None,
            "warms": warms,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTALS " + json.dumps(
        {
            "cold": round(sum(v["cold"] for v in out.values()), 3),
            "warm": round(
                sum(v["warm_min"] or 0 for v in out.values()), 3
            ),
        }
    ))


if __name__ == "__main__":
    main()
