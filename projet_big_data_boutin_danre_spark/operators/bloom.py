"""Distributed Bloom filter as a DataFrame — the approximate-
membership sidecar for exact-dedup admission at ingest.

Why this exists at 100 TB: the exact admission guard
(corpus_pipeline.incremental_ingest) answers "has this fingerprint
ever been admitted?" with a bucket-aligned join against the
fingerprint sidecar (~2% of the corpus). A Bloom layer is the fast
pre-filter in front of that join: ~10 bits/key (2^24-bit filter =
2 MiB covers ~1.7M keys at 1% fpp; scale ``hex_chars`` up for more),
broadcastable, and **no false negatives** — a key the probe calls
"definitely new" can skip the exact join entirely, and only the
"maybe seen" residue (true hits + fpp-rate noise) pays the sidecar
lookup. On a mostly-novel stream that removes the membership join
from the hot path.

Representation: a DataFrame of ``(word_idx: long, word: long)`` —
the SPARSE non-zero 64-bit words of the bitset. Bit positions come
from seeded md5 hex slices (the MinHash seeding discipline,
functions/hashing.py): position ``j`` of a key is the integer value
of the LAST ``hex_chars`` hex chars of ``md5(seed_j || key)`` — a
power-of-16 filter size means the slice IS the position, no modulo,
and the whole construction is engine-exact (the DuckDB twin spells
hex→int as an ``instr('0123456789abcdef', ch)`` polynomial).

Mergeability: two filters over the same geometry union by
``bit_or`` per word (:func:`bloom_merge`) — build per batch, merge
into the lake sidecar, never rebuild history. Replay-idempotent by
algebra: OR-ing the same batch twice is a no-op, and a LOST bloom
write is safe-by-construction (fewer bits set → more "maybe" →
extra exact-join work, never a wrong admission).

Reference scope: the reference pipeline has no approximate-membership
layer (its daily volumes don't need one); this is engine extension
surface for the 100 TB training-data path, after Bloom (1970) and the
partitioned-bitset layout every warehouse uses for join pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_CHARS_DEFAULT = 6  # 2^24 bits = 2 MiB; ~1.7M keys at ~1% fpp (k=4)
K_DEFAULT = 4  # hash functions; fpp ≈ (1 - e^(-k·n/m))^k


def _position(key: Column, j: int, hex_chars: int) -> Column:
    """Bit position ``j``: integer value of the last ``hex_chars``
    hex chars of the seeded digest ``md5(j| || key)`` (seed prefix
    omitted for j=0 — the minhash_component convention). 6 hex chars
    = 24 bits, well inside long; 15 (60 bits) is the conv() ceiling —
    enforced, because a silent overflow would desynchronize build and
    probe positions (a correctness bug, not a capacity one)."""
    if not 1 <= hex_chars <= 15:
        raise ValueError(
            f"hex_chars must be in [1, 15] (got {hex_chars}): 16 hex "
            "chars overflow conv()'s 64-bit result"
        )
    digest = F.md5(key) if j == 0 else F.md5(F.concat(F.lit(f"{j}|"), key))
    return F.conv(
        F.substring(digest, 33 - hex_chars, hex_chars), 16, 10
    ).cast("long")


def _positions_long(
    df: DataFrame,
    key_col: str,
    k: int,
    hex_chars: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (key row, hash j): (word_idx, bit) — the exploded
    long form the build starts from. Keys only: NULL keys are dropped
    (a NULL fingerprint never participates in dedup)."""
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_position(key, j, hex_chars) for j in range(k)])
    ).alias("__pos")
    return (
        df.filter(key.isNotNull())
        .select(*group_cols, key.alias("__key"), pos)
        .select(
            *group_cols,
            "__key",
            # integer DIV, not double division + cast: equal on the
            # non-negative sub-2^53 positions in use, but the twin's
            # hex polynomial is exact integer math and the documented
            # geometry is `pos // 64` — keep them identical everywhere
            F.expr("__pos DIV 64").alias("word_idx"),
            # PySpark's shiftleft() wants a literal shift — go through
            # the SQL form, which accepts a column
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))"
            ).alias("__mask"),
        )
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    k: int = K_DEFAULT,
    hex_chars: int = HEX_CHARS_DEFAULT,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Build the sparse bitset: ``(word_idx, word)`` with ``word`` the
    bit_or of every key's masks landing in that 64-bit word. One
    narrow shuffle on word_idx (at most 2^(4·hex_chars)/64 groups —
    262k for the default — regardless of input size); map-side
    partial bit_or does the heavy lifting. ``group_cols`` builds one
    independent filter per group (e.g. per source/lang shard) in a
    single pass."""
    return (
        _positions_long(df, key_col, k, hex_chars, group_cols)
        .groupBy(*group_cols, "word_idx")
        .agg(F.bit_or("__mask").alias("word"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two filters of the SAME geometry (k, hex_chars):
    per-word bit_or. Associative/commutative/idempotent — the lake
    sidecar merges batch filters without ever rescanning history."""
    return (
        a.unionByName(b).groupBy("word_idx").agg(F.bit_or("word").alias("word"))
    )


def bloom_probe(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str,
    k: int = K_DEFAULT,
    hex_chars: int = HEX_CHARS_DEFAULT,
    mode: str = "auto",
) -> DataFrame:
    """Membership pre-filter: the batch keyed rows plus a
    ``maybe_seen`` boolean. ``maybe_seen = false`` is a PROOF the key
    was never inserted (no false negatives); ``true`` means "check
    exactly" (true member, or false positive at the filter's fpp).

    Two plan shapes, same semantics, chosen by ``mode``:

    - ``"broadcast"`` — k broadcast LEFT joins of the FILTER (≤262k
      words ≈ 4 MiB at the default geometry), one per hash function,
      then a map-side AND of the per-hash bit tests: the batch takes
      ZERO exchanges. Right while the filter is small.
    - ``"stream"`` (r15) — the probe INVERSION for grown filters: the
      batch's k positions per key are BROADCAST against the filter
      scan (filter streamed map-side, never copied to every task's
      memory as a broadcast build), a key is "maybe" iff all k of its
      positions hit a set bit, and the batch-sized maybe-key set
      joins back broadcast. One rebuild-grown geometry step takes the
      filter ×16 — at hex 8+ a broadcast build is hundreds of MB per
      PROBE CALL, while the streamed shape pays one pruned 2-column
      scan. Costs one batch-sized distinct on the key column.
    - ``"auto"`` (default) — ``broadcast`` at ``hex_chars`` ≤ 6 (the
      dense filter caps at 2 MiB), ``stream`` above: the switch is a
      pure function of geometry, known statically — no stats job.

    All batch columns ride through; NULL keys probe ``False`` (a NULL
    key never participates in dedup)."""
    if mode not in ("auto", "broadcast", "stream"):
        raise ValueError(
            f"bloom_probe mode must be auto|broadcast|stream, got {mode!r}"
        )
    if mode == "auto":
        mode = "broadcast" if hex_chars <= HEX_CHARS_DEFAULT else "stream"
    key = F.col(key_col)
    if mode == "stream":
        if "__bp_key" in batch.columns:
            raise ValueError(
                "bloom_probe(mode='stream') reserves the column name "
                "'__bp_key' — rename it in the input"
            )
        keys = (
            batch.select(key.alias("__bp_key"))
            .filter(F.col("__bp_key").isNotNull())
            .distinct()
        )
        pos = _positions_long(keys, "__bp_key", k, hex_chars).select(
            F.col("__key").alias("__bp_key"), "word_idx", "__mask"
        )
        maybe_keys = (
            bloom.join(F.broadcast(pos), "word_idx")
            .filter((F.col("word").bitwiseAND(F.col("__mask"))) != 0)
            .groupBy("__bp_key")
            .agg(F.count(F.lit(1)).alias("__nhit"))
            # k rows per key by construction; a position whose word is
            # absent from the sparse filter is an unset bit (inner
            # join drops it), so all-k-hits == every bit set
            .filter(F.col("__nhit") == k)
            .select("__bp_key", F.lit(True).alias("__bp_maybe"))
        )
        return (
            batch.join(
                F.broadcast(maybe_keys),
                key == F.col("__bp_key"),
                "left",
            )
            .withColumn(
                "maybe_seen",
                F.when(key.isNull(), F.lit(False)).otherwise(
                    F.coalesce(F.col("__bp_maybe"), F.lit(False))
                ),
            )
            .drop("__bp_key", "__bp_maybe")
        )
    out = batch
    hit_cols = []
    for j in range(k):
        out = out.withColumn(f"__p{j}", _position(key, j, hex_chars))
        w = bloom.select(
            F.col("word_idx").alias(f"__wi{j}"),
            F.col("word").alias(f"__w{j}"),
        )
        out = out.join(
            F.broadcast(w),
            F.expr(f"__p{j} DIV 64") == F.col(f"__wi{j}"),
            "left",
        )
        hit_cols.append(
            F.coalesce(F.col(f"__w{j}"), F.lit(0)).bitwiseAND(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(__p{j} % 64 AS INT))"
                )
            )
            != 0
        )
    maybe = hit_cols[0]
    for h in hit_cols[1:]:
        maybe = maybe & h
    return out.withColumn(
        "maybe_seen", F.when(key.isNull(), F.lit(False)).otherwise(maybe)
    ).drop(
        *[c for j in range(k) for c in (f"__p{j}", f"__wi{j}", f"__w{j}")]
    )


def bloom_fill_stats(bloom: DataFrame, hex_chars: int = HEX_CHARS_DEFAULT) -> DataFrame:
    """Observability: bits set, non-zero words, and fill fraction —
    the saturation canary a recurring ingest should watch (fpp ≈
    fill^k; past ~50% fill it is time to grow ``hex_chars`` and
    rebuild from the exact sidecar)."""
    m = 1 << (4 * hex_chars)
    return bloom.agg(
        F.sum(F.bit_count("word")).alias("bits_set"),
        F.count(F.lit(1)).alias("words_nonzero"),
        (F.sum(F.bit_count("word")) / F.lit(float(m))).alias("fill_frac"),
    )
