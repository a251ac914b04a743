"""Media admission-probe scaling sweep (r14, verdict #2 — carried
from r12 #3): measure `phash_seen_ids` / `vhash_seen_ids` /
`audio_seen_ids` wall-time as the HISTORY sidecar grows 1x→32x while
the arriving batch stays fixed — the exact shape of an ingest
admission call against a growing lake. Also measures:

- the chunked mega-batch path (`max_broadcast_rows` forced tiny, so
  every probe runs the id-hash-modulus union) vs the plain broadcast
  path — the claim is that chunking costs ~n_chunks history scans and
  nothing super-linear;
- a NAIVE baseline for the image probe: the same band-equality join
  with a sort-merge hint (history shuffled + sorted per batch — what
  the plan notes say we must never do);
- the r14 verdict #3 companion numbers: per-batch `total_docs` via a
  parquet count of the docs layer (the pre-r14 cost — listing +
  footer reads growing with the lake) vs the 1-row `_lake_stats`
  read that replaced it.

History layers are WRITTEN TO PARQUET and read back, so the probe
scans real files like production, not a cached in-memory frame.
Bench-side measurement only — never a correctness input.

Usage: python tools/media_probe.py [sf_dir] [max_k] [probes,csv]
Output: one markdown table + a JSON line (SCALE.md protocol).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from projet_big_data_boutin_danre_spark.corpus_pipeline import (
    _read_lake_stats,
    _write_lake_stats,
)
from projet_big_data_boutin_danre_spark.operators import multimodal
from projet_big_data_boutin_danre_spark.session import get_spark
from projet_big_data_boutin_danre_spark.sources.readers import load_table


def scaled(df: DataFrame, id_col: str, k: int, stride: int) -> DataFrame:
    copies = df.sparkSession.range(k).select(F.col("id").alias("__copy"))
    return (
        df.crossJoin(F.broadcast(copies))
        .withColumn(id_col, F.col(id_col) + F.col("__copy") * F.lit(stride))
        .drop("__copy")
        .repartition(32)
    )


def _naive_phash_seen(
    batch_hashes: DataFrame, seen_hashes: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """The shape the plan notes forbid: same band-equality semantics
    as phash_seen_ids, but the corpus-sized history side is SHUFFLED
    AND SORTED per batch (merge-join hint, no broadcast)."""
    def _long(h: DataFrame, prefix: str) -> DataFrame:
        stack_args: list = [F.lit(multimodal.DHASH_BANDS)]
        for j in range(multimodal.DHASH_BANDS):
            stack_args += [F.lit(j), F.col(f"band{j}")]
        return h.filter(F.col("band0").isNotNull()).select(
            F.col("media_id").alias(f"{prefix}id"),
            *[
                F.col(f"band{j}").alias(f"{prefix}{j}")
                for j in range(multimodal.DHASH_BANDS)
            ],
            F.stack(*stack_args).alias("band", "band_key"),
        )

    seen_long = _long(seen_hashes, "s").hint("merge")
    batch_long = _long(batch_hashes, "b")
    ham = None
    for j in range(multimodal.DHASH_BANDS):
        term = F.bit_count(
            F.col(f"b{j}").bitwiseXOR(F.col(f"s{j}")).cast("long")
        )
        ham = term if ham is None else ham + term
    return (
        seen_long.join(batch_long, ["band", "band_key"])
        .filter(ham <= int(max_hamming))
        .select(F.col("bid").alias("media_id"))
        .distinct()
    )


def interleaved_min(probes: dict, rounds: int = 4) -> dict[str, float]:
    """The ab_probe protocol generalized to N candidates: one JOINT
    warmup run of every probe (codegen/page-cache paid outside the
    measurement), then ``rounds`` timed rounds with the order mirrored
    every other round (residual drift cancels instead of biasing the
    tail of the list), min per probe (host noise only adds time).
    Added for r15 verdict #3 — the sequential warm-once/time-once
    loop let the second execution of a probe reuse session state the
    first paid for (the AQE-coalesce artifact the r14 sweep-2 table
    flagged on its own sub-second cells)."""
    names = list(probes)
    for nm in names:
        probes[nm]()
    best = {nm: float("inf") for nm in names}
    for r in range(rounds):
        order = names if r % 2 == 0 else list(reversed(names))
        for nm in order:
            t0 = time.time()
            probes[nm]()
            best[nm] = min(best[nm], round(time.time() - t0, 3))
    return best


def big_main(n_max: int) -> None:
    """Synthetic big-history mode (`--big N`): the sf-derived sweep's
    sidecars top out around ~4e5 rows at 32x — every probe is
    driver-action-bound there and the broadcast-vs-shuffle story
    cannot show. Here the sidecars are built DIRECTLY (spark.range →
    hash columns, no payload decode) at N/4, N rows, written to
    parquet, and probed with a fixed batch that duplicates a slice of
    history (every row matches — the admission worst case). This is
    the regime where the naive SMJ baseline pays history shuffle+sort
    per batch and the broadcast probe does not. Timing protocol:
    :func:`interleaved_min` (r15 verdict #3)."""
    spark = get_spark("media_probe_big")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="media_probe_big_")
    ns = [max(n_max // 4, 1), n_max]
    results: dict[str, dict[int, float]] = {}
    try:
        for n in ns:
            kd = f"{work}/n{n}"
            base = spark.range(n)
            bands = base.select(
                F.col("id").alias("media_id"),
                *[
                    F.pmod(F.xxhash64("id", F.lit(j)), F.lit(65536))
                    .cast("int")
                    .alias(f"band{j}")
                    for j in range(multimodal.DHASH_BANDS)
                ],
            )
            bands.write.mode("overwrite").parquet(f"{kd}/media_bands")
            base.select(
                (F.col("id") / 20).cast("long").alias("media_id"),
                F.xxhash64("id").alias("hash64"),
                F.lit(20).alias("n_frames"),
            ).write.mode("overwrite").parquet(f"{kd}/media_vframes")
            base.select(
                (F.col("id") / 50).cast("long").alias("media_id"),
                (F.col("id") % 50).cast("int").alias("win_idx"),
                F.pmod(F.xxhash64("id"), F.lit(1 << 32)).alias("hash32"),
            ).write.mode("overwrite").parquet(f"{kd}/media_awins")
            seen_ph = spark.read.parquet(f"{kd}/media_bands")
            seen_vs = spark.read.parquet(f"{kd}/media_vframes")
            seen_aw = spark.read.parquet(f"{kd}/media_awins")
            # batches duplicate a history slice under fresh ids
            b_ph = seen_ph.filter(F.col("media_id") < 200).withColumn(
                "media_id", F.col("media_id") + F.lit(10 * n)
            ).localCheckpoint()
            b_vs = seen_vs.filter(F.col("media_id") < 50).withColumn(
                "media_id", F.col("media_id") + F.lit(10 * n)
            ).localCheckpoint()
            b_aw = seen_aw.filter(F.col("media_id") < 40).withColumn(
                "media_id", F.col("media_id") + F.lit(10 * n)
            ).localCheckpoint()
            probes = {
                "phash_seen": lambda: multimodal.phash_seen_ids(
                    b_ph, seen_ph
                ).count(),
                "phash_seen_chunked": lambda: multimodal.phash_seen_ids(
                    b_ph, seen_ph, max_broadcast_rows=200
                ).count(),
                "phash_seen_naiveSMJ": lambda: _naive_phash_seen(
                    b_ph, seen_ph
                ).count(),
                "vhash_seen": lambda: multimodal.vhash_seen_ids(
                    b_vs, seen_vs
                ).count(),
                "audio_seen": lambda: multimodal.audio_seen_ids(
                    b_aw, seen_aw
                ).count(),
            }
            best = interleaved_min(probes)
            for name, t in best.items():
                results.setdefault(name, {})[n] = t
            shutil.rmtree(kd, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print("\n| probe | " + " | ".join(f"{n:,} rows" for n in ns) + " |")
    print("|---" * (len(ns) + 1) + "|")
    for name, ts in results.items():
        print(
            f"| {name} | "
            + " | ".join(f"{ts[n]:.2f}" for n in ns)
            + " |"
        )
    print()
    print(json.dumps({"mode": "big", "ns": ns, "timings": results}))


def hot_main(n_hist: int, n_batch: int = 200) -> None:
    """Hot-bucket mode (`--hot N`): measure what `max_bucket` is FOR.
    History = N band rows with 1% sharing ONE (band, value) bucket
    (the all-black-thumbnail regime); the arriving batch is 200
    images that ALL carry the hot value in band0 (each with unique
    bands 1-3, one an exact duplicate of a history image). Uncapped,
    the probe's candidate join materializes 200 x N/100 rows; capped,
    the hot bucket leaves the batch side pre-join and the duplicate
    still matches through its other bands."""
    spark = get_spark("media_probe_hot")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="media_probe_hot_")
    try:
        base = spark.range(n_hist)
        bands = base.select(
            F.col("id").alias("media_id"),
            F.when(F.col("id") % 100 == 0, F.lit(0))
            .otherwise(
                F.pmod(F.xxhash64("id", F.lit(0)), F.lit(65536)).cast(
                    "int"
                )
            )
            .alias("band0"),
            *[
                F.pmod(F.xxhash64("id", F.lit(j)), F.lit(65536))
                .cast("int")
                .alias(f"band{j}")
                for j in range(1, multimodal.DHASH_BANDS)
            ],
        )
        bands.write.mode("overwrite").parquet(f"{work}/media_bands")
        seen = spark.read.parquet(f"{work}/media_bands")
        # batch: 200 all-hot-band images; image 0 duplicates history
        # row 100 exactly (its bands 1-3 match), the rest are new
        dup = seen.filter(F.col("media_id") == 100).select(
            (F.col("media_id") + 10 * n_hist).alias("media_id"),
            "band0", "band1", "band2", "band3",
        )
        fresh = spark.range(1, n_batch).select(
            (F.col("id") + 20 * n_hist).alias("media_id"),
            F.lit(0).alias("band0"),
            *[
                F.pmod(
                    F.xxhash64("id", F.lit(100 + j)), F.lit(65536)
                ).cast("int").alias(f"band{j}")
                for j in range(1, multimodal.DHASH_BANDS)
            ],
        )
        batch = dup.unionByName(fresh).localCheckpoint()
        timings = {}
        for name, mb in (("uncapped", None), ("max_bucket=1000", 1000)):
            fn = lambda: multimodal.phash_seen_ids(
                batch, seen, max_bucket=mb, max_hamming=0
            ).count()
            hits = fn()  # warm + correctness
            t0 = time.time()
            fn()
            timings[name] = (round(time.time() - t0, 3), hits)
        print(f"\n| arm | seconds | hits (expect 1 dup) |")
        print("|---|---|---|")
        for name, (t, h) in timings.items():
            print(f"| {name} | {t:.2f} | {h} |")
        print()
        print(json.dumps({"mode": "hot", "n_hist": n_hist,
                          "n_batch": n_batch,
                          "timings": {k: v[0] for k, v in timings.items()},
                          "hits": {k: v[1] for k, v in timings.items()}}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--big":
        big_main(int(sys.argv[2]))
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--hot":
        hot_main(
            int(sys.argv[2]),
            int(sys.argv[3]) if len(sys.argv) > 3 else 200,
        )
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    ks = [k for k in (1, 4, 16, 32, 64) if k <= max_k]
    spark = get_spark("media_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = load_table(spark, sf_dir, "documents")
    n_docs = docs0.count()
    work = tempfile.mkdtemp(prefix="media_probe_")

    # fixed arriving batch: media for the first ~600 base docs (~200
    # per modality), an exact content-duplicate of part of history —
    # the admission worst case (every row matches something)
    batch_media = multimodal.synth_media_from_documents(
        docs0.filter(F.col("doc_id") < 600)
    ).localCheckpoint()
    batch_ph = multimodal.perceptual_hash(batch_media).localCheckpoint()
    bvf = multimodal.video_frame_hashes(batch_media)
    bvd = bvf.select("media_id", "hash64").distinct().localCheckpoint()
    batch_vs = bvd.join(
        bvd.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames")),
        "media_id",
    ).localCheckpoint()
    batch_aw = multimodal.audio_window_hashes(batch_media).localCheckpoint()

    results: dict[str, dict[int, float]] = {}
    rows_hist: dict[int, dict[str, int]] = {}
    try:
        for k in ks:
            kd = f"{work}/k{k}"
            media = multimodal.synth_media_from_documents(
                scaled(docs0, "doc_id", k, n_docs)
            )
            # history sidecars, written then re-read (real file scans)
            multimodal.perceptual_hash(media).filter(
                F.col("band0").isNotNull()
            ).write.mode("overwrite").parquet(f"{kd}/media_bands")
            vf = multimodal.video_frame_hashes(media)
            vd = vf.select("media_id", "hash64").distinct()
            vd.join(
                vd.groupBy("media_id").agg(
                    F.count(F.lit(1)).alias("n_frames")
                ),
                "media_id",
            ).write.mode("overwrite").parquet(f"{kd}/media_vframes")
            multimodal.audio_window_hashes(media).write.mode(
                "overwrite"
            ).parquet(f"{kd}/media_awins")
            # docs layer + stats marker for the verdict #3 companion
            scaled(docs0, "doc_id", k, n_docs).select(
                "doc_id", "text", "lang"
            ).write.mode("overwrite").parquet(f"{kd}/docs")
            _write_lake_stats(spark, f"{kd}/_lake_stats", 0, None, None)

            seen_ph = spark.read.parquet(f"{kd}/media_bands")
            seen_vs = spark.read.parquet(f"{kd}/media_vframes")
            seen_aw = spark.read.parquet(f"{kd}/media_awins")
            rows_hist[k] = {
                "bands": seen_ph.count(),
                "vframes": seen_vs.count(),
                "awins": seen_aw.count(),
            }

            probes = {
                "phash_seen": lambda: multimodal.phash_seen_ids(
                    batch_ph, seen_ph
                ).count(),
                "phash_seen_chunked": lambda: multimodal.phash_seen_ids(
                    batch_ph, seen_ph, max_broadcast_rows=200
                ).count(),
                "phash_seen_naiveSMJ": lambda: _naive_phash_seen(
                    batch_ph, seen_ph
                ).count(),
                "vhash_seen": lambda: multimodal.vhash_seen_ids(
                    batch_vs, seen_vs
                ).count(),
                "vhash_seen_chunked": lambda: multimodal.vhash_seen_ids(
                    batch_vs, seen_vs, max_broadcast_rows=500
                ).count(),
                "audio_seen": lambda: multimodal.audio_seen_ids(
                    batch_aw, seen_aw
                ).count(),
                "audio_seen_chunked": lambda: multimodal.audio_seen_ids(
                    batch_aw, seen_aw, max_broadcast_rows=2000
                ).count(),
                "total_docs_count": lambda: spark.read.parquet(
                    f"{kd}/docs"
                ).count(),
                "lake_stats_read": lambda: _read_lake_stats(
                    spark, f"{kd}/_lake_stats"
                ),
            }
            for name, fn in probes.items():
                if only is not None and name not in only:
                    continue
                fn()  # warm (codegen + broadcast build)
                t0 = time.time()
                fn()
                results.setdefault(name, {})[k] = round(time.time() - t0, 3)
            shutil.rmtree(kd, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(
        "\n| probe | " + " | ".join(f"{k}x" for k in ks) + " | exponent |"
    )
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
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "ks": ks,
                "history_rows": rows_hist,
                "timings": results,
                "exponents": exps,
            }
        )
    )


if __name__ == "__main__":
    main()
