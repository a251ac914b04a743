"""Deduplication operators for large-scale text corpora.

Engine extension beyond the reference's single keep-last dedup
(``dags/lib/raw_to_fmt_lbc.py:49-51``): the operators a 100 TB
training-data pipeline needs. All are pure DataFrame algebra over
``md5`` hashing (cross-engine checkable, see functions/hashing.py);
no Python UDFs, no driver-side collects.

Scale design:
- ``exact_dedup``: one hash-aggregate on the content hash. The hash is
  computed map-side, so the shuffle carries (hash, id) not full text.
- ``minhash_lsh_pairs``: shingling fans out rows (explode) but each
  shingle row is tiny; signatures reduce back to one row per doc
  (map-side partial min). The LSH band self-join shuffles on the band
  key — candidate buckets are small by construction, so the join is
  narrow; no O(n²) anywhere.
- ``simhash``: explode tokens → per-bit partial sums (map-side
  combine) → 1 row/doc.
- ``ngram_jaccard_pairs``: candidate pairs come from a blocking key
  (caller-chosen, e.g. LSH band or source); the n-gram join is on
  (block, gram) — never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_min_shingle, normalize_text


def exact_dedup_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact duplicate groups by normalized-content hash: one row per
    distinct content with the keeper (min id) and duplicate count."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.md5(normalize_text(text_col)).alias("content_hash"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per distinct normalized content (min id wins —
    deterministic, unlike ``dropDuplicates``)."""
    keepers = exact_dedup_stats(df, id_col, text_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")


def char_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Character k-shingles via posexplode(sequence) — one row per
    (doc, offset). Text is normalized first so whitespace/punct noise
    doesn't defeat the match."""
    norm = normalize_text(text_col)
    return (
        df.select(F.col(id_col).alias("id"), norm.alias("__t"))
        .select(
            "id",
            F.posexplode(
                F.sequence(F.lit(1), F.greatest(F.length("__t") - F.lit(k - 1), F.lit(1)))
            ).alias("__i", "pos"),
            F.col("__t"),
        )
        .select("id", F.substring(F.col("__t"), F.col("pos"), k).alias("shingle"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_k: int = 8,
) -> DataFrame:
    """MinHash signature per document: ``num_hashes`` independent
    min-of-md5(seeded shingle) columns ``sig_0..sig_{n-1}``.

    One explode + one hash-aggregate; partial mins combine map-side so
    the shuffle carries one row per (doc, partition)."""
    shingles = char_shingles(df, id_col, text_col, k=shingle_k)
    aggs = [
        F.min(md5_min_shingle(F.col("shingle"), s)).alias(f"sig_{s}")
        for s in range(num_hashes)
    ]
    return shingles.groupBy("id").agg(*aggs)


def lsh_bands(
    sigs: DataFrame, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Banding: hash each contiguous signature slice to a bucket key.
    Output: (id, band, band_key) — ``bands`` rows per doc."""
    rows_per_band = num_hashes // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"sig_{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    return sigs.select(
        "id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 8,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that share at least
    one LSH band bucket.

    One aggregation per bucket (collect ids) + double-explode pair
    expansion: a single pass over the signatures — no self-join, so
    the shingle → signature subplan is computed once. (Nested
    higher-order slice/transform expressions were ~50× slower here —
    generators beat HOF chains for pair fan-out.) The only shuffles
    are the signature groupBy and the bucket groupBy; bucket pair
    blowup is quadratic in bucket size by construction (LSH buckets
    are small)."""
    b = lsh_bands(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_k),
        num_hashes,
        bands,
    )
    buckets = (
        b.groupBy("band", "band_key")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        buckets.select("ids", F.explode("ids").alias("id_a"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """SimHash over whitespace tokens of the normalized text.

    Token hash = first bits/4 hex chars of md5(token); bit j of the
    doc hash = sign of Σ_tokens (2·bit_j(token) − 1). Output: the
    ``bits``-length bit string (msb-first) as ``simhash_bits``.

    Explode + per-bit conditional sums with map-side combine; the
    per-bit expressions are generated Column algebra (bits ≤ 64).
    """
    hex_chars = bits // 4
    tokens = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("id", F.substring(F.md5(F.col("tok")), 1, hex_chars).alias("h"))
    )
    # nibble value of hex char i (1-based): conv is Spark-side;
    # the oracle spells it instr('0123456789abcdef', ch)-1.
    sums = []
    for i in range(hex_chars):
        nib = F.conv(F.substring(F.col("h"), i + 1, 1), 16, 10).cast("int")
        for k in (3, 2, 1, 0):  # msb-first within the nibble
            bit = F.floor(nib / F.lit(2**k)).cast("int") % 2
            j = i * 4 + (3 - k)
            sums.append(F.sum(bit * 2 - 1).alias(f"s_{j}"))
    per_doc = tokens.groupBy("id").agg(*sums)
    bit_chars = [
        F.when(F.col(f"s_{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(bits)
    ]
    return per_doc.select("id", F.concat(*bit_chars).alias("simhash_bits"))


def word_ngrams(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-grams per document (normalized tokens)."""
    toks = F.split(normalize_text(text_col), " ")
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size("__toks") - F.lit(n - 1), F.lit(1)),
                    ),
                    # try_element_at: past-the-end offsets on short docs
                    # yield null (concat_ws skips them) instead of an
                    # ANSI INVALID_ARRAY_INDEX error.
                    lambda i: F.concat_ws(
                        " ",
                        *[F.try_element_at("__toks", i + off) for off in range(n)],
                    ),
                )
            ).alias("gram"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """n-gram Jaccard similarity for all pairs within a blocking key.

    |A∩B| via per-(block, gram) id-list collection + in-array pair
    expansion; |A∪B| = |A|+|B|−|A∩B|. Single pipeline — the gram
    explode runs ONCE (per-id sizes ride along as a window count, and
    pair members carry their sizes), instead of the naive
    3-computations-plus-2-joins shape. Shuffles: by id (size window),
    by (block, gram) (bucket agg), by pair (count agg).

    The blocking key bounds pair fan-out; a gram shared by the whole
    block is quadratic in block size — that's the algorithm, pick
    blocks accordingly. Output: id_a < id_b, jaccard rounded to 6dp."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        F.col(text_col).alias("__txt"),
    )
    grams = word_ngrams(base, "id", "__txt", n=n).join(
        base.select("id", "block"), "id"
    )
    grams_n = grams.withColumn(
        "n_grams", F.count(F.lit(1)).over(Window.partitionBy("id"))
    )
    members = (
        grams_n.groupBy("block", "gram")
        .agg(F.collect_list(F.struct("id", "n_grams")).alias("ms"))
        .filter(F.size("ms") > 1)
    )
    out = (
        members.select("ms", F.explode("ms").alias("a"))
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("a.n_grams").alias("na"),
            F.col("b.id").alias("id_b"),
            F.col("b.n_grams").alias("nb"),
        )
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
    if min_jaccard > 0:
        out = out.filter(F.col("jaccard") >= F.lit(min_jaccard))
    return out
