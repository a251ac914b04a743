"""Text-analysis operators for corpus pipelines (engine extension).

Language ID (stopword-profile heuristic), quality scoring, token
counting, and document fingerprinting — all as JVM-side Column
algebra over the ``documents`` table. Each has an exact ANSI-SQL
twin for the DuckDB oracle (same arithmetic, same rounding).

Scale: every operator here is a narrow map (no shuffle) — it
pipelines with the scan and keeps whole-stage codegen intact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import normalize_text, stable_fingerprint

# Tiny per-language stopword profiles (public, standard closed-class
# words). Kept deliberately small so the SQL twin stays readable.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "fr": ["le", "la", "et", "les", "des", "un", "une"],
    "es": ["el", "los", "las", "una", "y", "en", "que"],
    "de": ["der", "die", "das", "und", "ein", "nicht", "ist"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (empty-safe)."""
    c = normalize_text(col)
    return F.filter(F.split(c, " "), lambda t: t != "")


def normalize_text_py(t: str) -> str:
    """THE driver/UDF-side Python twin of ``cleaning.normalize_text``
    (lower → non-alnum→space → collapse runs → strip). Single shared
    definition: lm.reference_ppl and bpe's encode UDF both pin
    against the JVM tokenizer through this one function — a tweak to
    the normalizer happens in exactly two places (Column + Python),
    never three."""
    import re

    return re.sub(r" +", " ", re.sub(r"[^a-z0-9]+", " ", t.lower())).strip()


def normalize_text_aligned_py(t: str) -> str:
    """Python twin of ``hashing.normalize_text_aligned`` (ASCII
    casefold via a char-for-char table + 1-char punctuation masking,
    no collapse/trim — length-preserving by construction)."""
    import re
    import string

    lowered = t.translate(
        str.maketrans(string.ascii_uppercase, string.ascii_lowercase)
    )
    return re.sub(r"[^a-z0-9]", " ", lowered)


def tokens_py(t: str | None) -> list[str]:
    """Python twin of :func:`tokens` (empty-safe, None-safe)."""
    if not t:
        return []
    return [w for w in normalize_text_py(t).split(" ") if w]


def token_count(col: Column | str) -> Column:
    """Token count (whitespace segmentation after normalization)."""
    return F.size(tokens(col))


# GPT-2-style pre-tokenization classes, restricted to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): no
# lookahead, ASCII classes. Alternatives: common English contraction
# suffixes, space-absorbed letter runs, digit runs, punctuation runs.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+"


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish token count over the RAW text (pre-tokenizer match
    count — the standard cheap proxy for LLM token budgets when the
    real tokenizer isn't in the data plane)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """How many tokens are in ``lang``'s stopword profile."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words)))


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword hits, ``und`` when no
    profile scores > 0. Ties break by profile order (en,fr,es,de) —
    the SQL twin uses the same CASE ordering."""
    hits = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    out = F.when(best <= 0, F.lit("und"))
    for lang in STOPWORDS:  # first max wins, fixed order
        out = out.when(hits[lang] == best, F.lit(lang))
    return out


def quality_score(text_col: Column | str, round_to: int = 4) -> Column:
    """Composite quality score in [0,1]:

    0.4·length_score + 0.3·alpha_ratio + 0.3·space_ratio_score

    - length_score = least(n_chars/500, 1)
    - alpha_ratio  = alphanumeric+space chars / total chars
    - space_ratio_score = 1 − |space_ratio − 0.15|·2 clamped to [0,1]
      (prose has ~15% spaces; walls of text or char soup score low)

    Pure arithmetic over ``length``/``regexp_replace`` so the DuckDB
    twin is identical expression-for-expression.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(c).cast("double")
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z0-9 ]", "")).cast("double")
    n_space = (n - F.length(F.regexp_replace(c, " ", ""))).cast("double")
    length_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, n_alpha / n).otherwise(F.lit(0.0))
    space_score = F.greatest(
        F.lit(0.0),
        F.lit(1.0) - F.abs(n_space / F.greatest(n, F.lit(1.0)) - F.lit(0.15)) * 2,
    )
    score = (
        F.lit(0.4) * length_score + F.lit(0.3) * alpha_ratio + F.lit(0.3) * space_score
    )
    # floor(x*10^k + 0.5), NOT round(x, k): engines implement round()
    # on doubles differently (Spark: BigDecimal HALF_UP of the exact
    # binary value; DuckDB: C-library rounding), and scores landing
    # within an ulp of a .xxxx5 boundary come out different. The floor
    # formulation is the same IEEE multiply-add-floor sequence in both
    # engines, so the result is identical by construction.
    scale = F.lit(float(10**round_to))
    return F.floor(score * scale + F.lit(0.5)) / scale


def length_quantiles(
    df: DataFrame,
    text_col: str,
    by: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group document-length distribution: count, mean, and exact
    percentiles. ``percentile`` (exact, linear interpolation — the
    same definition as SQL ``quantile_cont``) rather than
    ``approx_percentile``: exact is oracle-checkable bit-for-bit, and
    its cost is a per-group sort of group-local values — fine while
    group count is small. At 100 TB with huge groups, swap in
    ``approx_percentile`` (Greenwald-Khanna-style summary, mergeable map-side; rank error ≤ 1/accuracy) — same call
    shape, bounded memory."""
    plist = ", ".join(str(p) for p in probs)
    qs = F.expr(f"percentile(length({text_col}), array({plist}))")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.length(text_col)).alias("avg_len"),
        *[qs.getItem(i).alias(f"p{int(p * 100)}") for i, p in enumerate(probs)],
    ]
    return df.groupBy(by).agg(*aggs)


def length_histogram(
    df: DataFrame,
    text_col: str,
    by: str,
    bin_width: int = 64,
) -> DataFrame:
    """Per-group document-length histogram with fixed-width bins:
    ``(by, hist, n_bins)`` where ``hist`` is a bin-ordered
    ``bin:count`` CSV (bin = floor(length / bin_width)). The
    distribution companion to the percentile profile — percentiles
    answer "where is the mass", the histogram shows SHAPE (bimodal
    chunk-vs-doc mixes, truncation spikes at crawler limits).

    Integer-exact by construction (no interpolation), so unlike
    approx sketches it is oracle-hashable. Shape: one groupBy on
    (group, bin) with map-side combine — at 100 TB the shuffle
    carries one row per occupied bin per group, not per document —
    then a per-group ordered rollup. NULL lengths are excluded (a
    NULL text has no length, matching the quantile ops' treatment)."""
    b = F.floor(F.length(text_col) / F.lit(int(bin_width))).cast("bigint")
    per_bin = (
        df.filter(F.length(text_col).isNotNull())
        .groupBy(F.col(by), b.alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return per_bin.groupBy(by).agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__bin"),
                            F.concat_ws(
                                ":",
                                F.col("__bin").cast("string"),
                                F.col("__c").cast("string"),
                            ).alias("s"),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
        ).alias("hist"),
        F.count(F.lit(1)).alias("n_bins"),
    )


def length_trim(
    df: DataFrame,
    text_col: str,
    by: str,
    lo: float = 0.05,
    hi: float = 0.95,
    approx: bool = False,
) -> DataFrame:
    """Per-group length-outlier removal: keep documents whose text
    length lies within the group's [``lo``, ``hi``] length quantiles
    (inclusive) — the standard trim of truncated fragments and
    concatenation accidents before training. NULL-text docs are
    dropped (no length, no evidence).

    Shape: one per-group quantile aggregation (#groups rows — model
    state), broadcast back onto the corpus, map-only filter. Exact
    ``percentile`` buffers each group's lengths (fine at oracle SF
    and shares DuckDB's ``quantile_cont`` interpolation bit-for-bit);
    ``approx=True`` swaps in the fixed-memory mergeable
    ``approx_percentile`` sketch — the 100 TB default, same plan
    shape."""
    ln = F.length(text_col)
    fn = "approx_percentile" if approx else "percentile"
    qs = F.expr(f"{fn}(length({text_col}), array({float(lo)}, {float(hi)}))")
    bounds = df.groupBy(by).agg(
        qs.getItem(0).alias("__q_lo"), qs.getItem(1).alias("__q_hi")
    )
    return (
        df.join(F.broadcast(bounds), by)
        .filter(ln.between(F.col("__q_lo"), F.col("__q_hi")))
        .drop("__q_lo", "__q_hi")
    )


def length_quantiles_approx(
    df: DataFrame,
    text_col: str,
    by: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB companion of :func:`length_quantiles`: same output
    shape, ``approx_percentile`` instead of exact ``percentile``. The
    exact aggregate buffers EVERY group-local value for a final
    per-group sort — memory ∝ group size, the thing that OOMs when one
    language holds 10^11 documents. The approximation keeps a
    fixed-size quantile summary per group that merges map-side
    (partial aggregation works, memory bounded by ``accuracy``
    regardless of group size), with rank error ≤ 1/accuracy.
    Accuracy=10k → ±0.01% rank error: indistinguishable from exact
    for corpus-profile decisions. Approx results are engine-specific
    (no DuckDB twin) — pytest pins them against exact within the rank
    bound at test scale."""
    plist = ", ".join(str(p) for p in probs)
    qs = F.expr(
        f"approx_percentile(length({text_col}), array({plist}),"
        f" {int(accuracy)})"
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.length(text_col)).alias("avg_len"),
        *[
            qs.getItem(i).cast("double").alias(f"p{int(p * 100)}")
            for i, p in enumerate(probs)
        ],
    ]
    return df.groupBy(by).agg(*aggs)


def text_profile(
    df: DataFrame, id_col: str, text_col: str, include_pii: bool = False
) -> DataFrame:
    """One-pass per-document text profile: token count, detected lang,
    quality score, fingerprint — plus, with ``include_pii``, the PII
    redaction-class counts and scrubbed fingerprint (same staged
    semantics as :func:`pii_scrub`). Single narrow projection either
    way."""
    cols = [
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        lang_id(text_col).alias("lang_detected"),
        quality_score(text_col).alias("quality"),
        stable_fingerprint(text_col).alias("fingerprint"),
    ]
    if include_pii:
        cols += _pii_columns(text_col)
    return df.select(*cols)


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_chars: int = 1000,
    overlap: int = 100,
) -> DataFrame:
    """Split documents into overlapping character chunks — the
    training-data / RAG preprocessing step downstream of dedup and
    quality filtering. Output: (doc_id, chunk_id, chunk, n_chars),
    chunk_id 0-based in document order.

    Pure column algebra (posexplode over a stride sequence +
    substring): a narrow map fused with the scan — no UDF, no
    shuffle, and the ~(len/stride)x row fan-out happens map-side
    where the downstream consumer (tokenizer, embedder) wants
    parallelism anyway. Empty/short docs yield exactly one chunk.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    t = F.col(text_col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(t) - F.lit(overlap), F.lit(1)),
        F.lit(step),
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            t.alias("__t"),
            F.posexplode(starts).alias("chunk_id", "__start"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.substring(F.col("__t"), F.col("__start"), chunk_chars).alias(
                "chunk"
            ),
        )
        .withColumn("n_chars", F.length("chunk"))
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Token-window chunking: whitespace tokens of the normalized
    text, windows of ``chunk_tokens`` advancing by ``chunk_tokens -
    overlap``. Output: (doc_id, chunk_id, chunk, n_tokens), chunks
    re-joined with single spaces.

    Same shape as ``chunk_text`` (posexplode + slice on the token
    array — higher-order functions, no UDF); use it when budgets are
    token-denominated (LLM context windows) rather than byte-sized."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(text_col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - F.lit(overlap), F.lit(1)),
        F.lit(step),
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_id", "__start"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.slice(F.col("__toks"), F.col("__start"), chunk_tokens).alias(
                "__w"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.concat_ws(" ", F.col("__w")).alias("chunk"),
            F.size("__w").alias("n_tokens"),
        )
    )


# PII patterns, restricted (like BPE_TOKEN_RE) to constructs with
# identical semantics in Java regex and RE2: no lookahead/backrefs,
# ASCII classes, \b word boundaries (ASCII in both engines).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
LONG_NUM_RE = r"[0-9]{9,}"

# Word/trim regexes for clean_lines: an explicit ASCII-whitespace
# class (NOT \s — Java's \s includes \x0B, RE2's does not) so the
# DuckDB oracle twin is byte-identical. \n never appears inside a
# line (lines come from a split on \n).
CLEAN_WORD_RE = r"[^ \t\f\r\x0B\n]+"
CLEAN_TRIM_RE = r"^[ \t\f\r\x0B]+|[ \t\f\r\x0B]+$"


def clean_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 3,
    blocklist: tuple[str, ...] = (),
    require_terminal_punct: bool = False,
    out_col: str = "clean_text",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2, the
    public recipe): drop lines with fewer than ``min_words`` words,
    lines containing any ``blocklist`` word (case-insensitive
    substring — C4 used "javascript", policy boilerplate, lorem
    ipsum), and — when ``require_terminal_punct`` — lines that do not
    end in terminal punctuation. Kept lines are rejoined with ``\\n``
    so downstream operators see a normal document.

    Output: (id, ``out_col``, n_lines_total, n_lines_kept) — the
    counts make the filter auditable per doc (and give the corpus
    drop-rate in one aggregation). ``extra_cols`` names passthrough
    columns to carry (lang/source/... when the pass rewrites a corpus
    in place, e.g. the pipeline's ``cleaned`` layer) — projection
    only, never a join.

    Words are maximal runs of non-whitespace — the C4 recipe counts
    via Python ``str.split()``, i.e. any whitespace separates words,
    not just spaces. The class is spelled out (``[ \\t\\f\\r\\x0B]``)
    instead of ``\\s`` because Java's ``\\s`` includes ``\\x0B`` while
    RE2's does not; an explicit class keeps the Spark pass and its
    DuckDB oracle twin byte-identical.

    Scale: pure Column algebra — one ``split`` on newlines, one
    higher-order ``filter`` over the per-doc line array (bounded by
    doc size, exactly like the span-cut fold), one ``array_join``; no
    shuffle, no UDF, whole-stage codegen. Each predicate has an exact
    ANSI-SQL twin (``list_filter`` + the same regexes), so the pass is
    oracle-checkable bit-for-bit."""
    c = F.col(text_col)
    lines = F.split(c, "\n")

    def _keep(line: Column) -> Column:
        word_cnt = F.size(
            F.regexp_extract_all(line, F.lit(CLEAN_WORD_RE), F.lit(0))
        )
        cond = word_cnt >= F.lit(int(min_words))
        for w in blocklist:
            cond = cond & ~F.lower(line).contains(w.lower())
        if require_terminal_punct:
            cond = cond & F.regexp_replace(
                line, CLEAN_TRIM_RE, ""
            ).rlike('[.!?"]$')
        return cond

    kept = F.filter(lines, _keep)
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias(out_col),
        F.size(lines).alias("n_lines_total"),
        F.size(kept).alias("n_lines_kept"),
        *[F.col(c) for c in extra_cols],
    )


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus PII scrubbing pass (engine extension for the LLM-data
    roadmap): redact emails, IPv4 addresses, and long digit runs
    (phone/account-number proxy) with typed placeholders, and count
    each redaction class.

    Matching is staged — emails first, then IPs on the email-scrubbed
    text, then digit runs on the IP-scrubbed text — so a digit run
    inside an email's local part is billed once as EMAIL, and the
    counts are a well-defined function of the input in both engines
    (counts are measured on the same staged text the replacement sees).

    Scale: one narrow projection, three regex passes fused into one
    whole-stage-codegen stage; no shuffle, no UDF. Real deployments
    swap patterns, not plumbing."""
    return df.select(F.col(id_col), *_pii_columns(text_col))


def _pii_columns(text_col: str) -> list[Column]:
    """The scrub projection, reusable by :func:`text_profile`."""
    c = F.col(text_col)
    after_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    scrubbed = F.regexp_replace(after_ip, LONG_NUM_RE, "<NUM>")
    return [
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(after_ip, F.lit(LONG_NUM_RE)).alias("n_long_nums"),
        F.length(scrubbed).alias("scrubbed_len"),
        F.md5(scrubbed).alias("scrubbed_fp"),
    ]


def assemble_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "chunk_id",
    chunk_col: str = "chunk",
    sep: str = "",
) -> DataFrame:
    """Inverse of :func:`chunk_text`/:func:`chunk_tokens`: reassemble
    per-document text from its chunks in ``order_col`` order —
    the shuffle-read side of a chunked corpus (model outputs keyed by
    chunk, multi-part documents, conversation threads).

    One shuffle on the id; order is enforced inside the aggregation
    (``sort_array`` over (order, chunk) structs — deterministic
    regardless of arrival order), so no global sort is needed. For
    zero-overlap char chunks, ``assemble_chunks(chunk_text(df, ...,
    overlap=0))`` reproduces the original text exactly (property-
    tested)."""
    return (
        chunks.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col(order_col).alias("o"),
                                F.col(chunk_col).alias("c"),
                            )
                        )
                    ),
                    lambda s: s["c"],
                ),
                sep,
            ).alias("text"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
    )


def doc_keywords(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Per-document keyword extraction: ``(id, top_terms)`` where
    ``top_terms`` is the top-``k`` tokens as a rank-ordered
    ``tok:tf:df`` CSV. Ranking is (term frequency desc, document
    frequency asc, token asc) — the integer-exact core of tf-idf
    (higher tf first; rarer-across-corpus breaks ties) with no float
    ``log`` to diverge cross-engine, so the whole surface is
    oracle-hashable.

    Shape: one (doc, token) wordcount (map-side combine — the shuffle
    carries per-doc distinct tokens, not the token stream), a
    vocabulary-sized document-frequency rollup derived FROM that
    frame (post-combine rows, not a second corpus scan), one join
    keyed on token (AQE broadcasts the df side while the vocabulary
    fits; web-scale vocabularies fall back to a shuffle join), and a
    ranking window partitioned BY DOCUMENT — never global."""
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(
            F.col("tf").desc(), F.col("df").asc(), F.col("tok")
        )
    )
    ranked = tf.join(dfreq, "tok").withColumn("rn", rn).filter(
        F.col("rn") <= k
    )
    return ranked.groupBy(id_col).agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("rn"),
                            F.concat_ws(
                                ":",
                                "tok",
                                F.col("tf").cast("string"),
                                F.col("df").cast("string"),
                            ).alias("s"),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
        ).alias("top_terms")
    )


def repetition_profile(
    df: DataFrame, id_col: str, text_col: str, round_to: int = 6
) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et
    al. 2021 §A1.1 use duplicate-n-gram and top-n-gram coverage as
    corpus filters; boilerplate and spam are repetition-heavy):

    - ``n_tokens``: whitespace tokens of the normalized text;
    - ``n_bigrams`` / ``n_distinct_bigrams`` and ``dup_bigram_frac`` =
      1 − distinct/total (0.0 when a doc has < 2 tokens);
    - ``top_bigram`` (smallest lexicographically among the most
      frequent — deterministic under ties), ``top_bigram_n``, and
      ``top_bigram_frac`` = 2·top_n / n_tokens — the fraction of
      tokens covered by occurrences of the single hottest bigram.

    Shape: one explode to (doc, bigram), a (doc, bigram) wordcount
    (map-side combine), a per-doc rollup with ``min_by`` for the
    hottest gram, and a left join back so short docs survive with
    zeroed signals — the canonical scalable wordcount plan, never
    O(tokens²) per row. Fractions use the floor(x·10^r + 0.5)
    rounding shared with :func:`quality_score` so the DuckDB twin is
    bit-identical."""
    toks = F.split(normalize_text(text_col), " ")
    base = df.select(
        F.col(id_col).alias("id"),
        F.filter(toks, lambda t: t != "").alias("__toks"),
    ).select(
        "id", F.coalesce(F.size("__toks"), F.lit(0)).alias("n_tokens"),
        "__toks",
    )
    grams = base.filter(F.col("n_tokens") >= 2).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n_tokens") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.try_element_at("__toks", i),
                    F.try_element_at("__toks", i + 1),
                ),
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.max("c").alias("top_bigram_n"),
        F.min_by("gram", F.struct((-F.col("c")).alias("nc"), "gram")).alias(
            "top_bigram"
        ),
    )

    def _r(x):  # shared cross-engine rounding (see quality_score)
        scale = F.lit(float(10**round_to))
        return F.floor(x * scale + F.lit(0.5)) / scale

    return (
        base.join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_distinct_bigrams", F.lit(0)).alias(
                "n_distinct_bigrams"
            ),
            F.when(
                F.col("n_bigrams") > 0,
                _r(
                    F.lit(1.0)
                    - F.col("n_distinct_bigrams") / F.col("n_bigrams")
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_frac"),
            F.col("top_bigram"),
            F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n"),
            F.when(
                F.col("n_tokens") > 0,
                _r(
                    F.coalesce(F.col("top_bigram_n"), F.lit(0))
                    * 2
                    / F.col("n_tokens")
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
        )
    )


def ngram_contamination(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    probes: DataFrame,
    probe_id_col: str,
    probe_text_col: str,
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination scan (the GPT-3 appendix-C /
    PaLM-style filter): find training documents sharing any word
    ``n``-gram with a held-out probe set (benchmark prompts, eval
    answers). Returns one row per contaminated doc:
    ``(id, n_hit_grams, n_hit_probes)`` — distinct colliding grams and
    distinct probe docs hit. Clean docs are absent (at 100 TB almost
    everything is clean; emitting them would dwarf the signal).

    Scale shape: the probe side (benchmarks: thousands of docs, not
    billions) reduces to a distinct (gram → probe ids) table that is
    BROADCAST; the corpus side explodes to distinct per-doc grams and
    hash-joins without shuffling the corpus. The only wide exchange is
    the per-doc rollup of hits — bounded by contaminated docs only.
    Grams under ``n`` tokens don't match (short docs are never flagged
    by a too-short gram): both sides gram only windows with a full
    ``n`` tokens."""
    from pyspark.sql.functions import broadcast

    def _full_grams(df: DataFrame, i: str, t: str, dedup: bool) -> DataFrame:
        # tokenize in its OWN projection (inlining normalize+split
        # into the gram lambdas re-evaluates it per call site — the
        # word_ngrams lesson), but explode the gram expression
        # DIRECTLY: exploding a separately-projected array column
        # defeats generator fusion and materializes every window
        # array (measured ~17x slower on this scan). Explode of an
        # empty array emits no rows, so short docs drop for free.
        out = (
            df.select(
                F.col(i).alias("id"),
                F.split(normalize_text(t), " ").alias("__toks"),
            )
            .select(
                "id",
                F.explode(
                    full_window_grams(F.col("__toks"), n)
                ).alias("gram"),
            )
        )
        return out.distinct() if dedup else out

    # probe side: distinct matters — it is what gets broadcast.
    probe_grams = _full_grams(
        probes, probe_id_col, probe_text_col, dedup=True
    ).select(F.col("id").alias("probe_id"), "gram")
    # corpus side (r19, guide §2.4): NO pre-distinct. The old
    # ``.distinct()`` here was a full shuffle of every corpus gram
    # string — the one corpus-wide exchange in the operator — and it
    # was redundant: the broadcast join filters map-side either way,
    # and the ``countDistinct`` rollup dedups per doc over the MATCHED
    # rows only (bounded by contamination, exactly the rollup exchange
    # the docstring promises). Results are identical; the corpus now
    # genuinely never shuffles ungrouped gram rows.
    doc_grams = _full_grams(docs, id_col, text_col, dedup=False)
    return (
        doc_grams.join(broadcast(probe_grams), "gram")
        .groupBy("id")
        .agg(
            F.countDistinct("gram").alias("n_hit_grams"),
            F.countDistinct("probe_id").alias("n_hit_probes"),
        )
        .withColumnRenamed("id", id_col)
    )


def decontaminate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    probes: DataFrame,
    probe_id_col: str,
    probe_text_col: str,
    n: int = 8,
    min_hit_grams: int = 1,
) -> DataFrame:
    """Drop every training doc flagged by :func:`ngram_contamination`
    with at least ``min_hit_grams`` colliding n-grams. One anti-join
    against the (small) contaminated-id set."""
    flagged = ngram_contamination(
        docs, id_col, text_col, probes, probe_id_col, probe_text_col, n
    ).filter(F.col("n_hit_grams") >= min_hit_grams).select(id_col)
    return docs.join(flagged, id_col, "left_anti")


def vocab_topk(
    df: DataFrame, text_col: str, by: str, k: int = 3
) -> DataFrame:
    """Per-group vocabulary statistics: distinct-token count and the
    top-``k`` tokens by frequency as a deterministic ``tok:count`` CSV
    (rank order; ties broken lexicographically). The corpus-analysis
    staple behind stopword lists, tokenizer health checks, and
    boilerplate spotting.

    Shape: token wordcount per group (explode + map-side-combined
    count), one window ranking partitioned BY GROUP (never a global
    window), then a per-group rollup. The ranking shuffle carries
    (group, token, count) — post-combine, not raw tokens."""
    from pyspark.sql import Window

    toks = (
        df.select(
            F.col(by).alias("grp"),
            F.explode(
                F.filter(
                    F.split(normalize_text(text_col), " "),
                    lambda t: t != "",
                )
            ).alias("tok"),
        )
    )
    counts = toks.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("c"))
    rn = F.row_number().over(
        Window.partitionBy("grp").orderBy(F.col("c").desc(), F.col("tok"))
    )
    ranked = counts.withColumn("rn", rn)
    return (
        ranked.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_vocab"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") <= k,
                                F.struct(
                                    F.col("rn"),
                                    F.concat_ws(
                                        ":", "tok", F.col("c").cast("string")
                                    ).alias("s"),
                                ),
                            )
                        )
                    ),
                    lambda x: x["s"],
                ),
            ).alias("top_tokens"),
        )
        .withColumnRenamed("grp", by)
    )


def full_window_grams(toks: Column, n: int) -> Column:
    """Array of ALL full ``n``-token windows of a token array column —
    empty when the doc has fewer than ``n`` tokens (a short doc must
    never contribute a degraded shorter gram to containment-style
    matching; contrast ``dedup.word_ngrams``, where degrading is fine
    for Jaccard). The ONE shared gram builder behind the batch
    contamination scan, the probe-set collector, and the streaming
    filter — keeping their window arithmetic in lockstep is what makes
    batch/stream decontamination agreement structural."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda s: F.concat_ws(
                " ", *[F.try_element_at(toks, s + off) for off in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def probe_gram_set(
    probes: DataFrame, probe_id_col: str, probe_text_col: str, n: int = 8
) -> list[str]:
    """Driver-side distinct full-window n-gram set of a probe corpus —
    bounded model state (benchmark sets are thousands of docs, not
    billions), the same legitimacy class as IVF centroids. Sorted for
    determinism. Feed to :func:`decontaminate_stream`."""
    grams = (
        probes.select(
            F.split(normalize_text(probe_text_col), " ").alias("__toks")
        )
        .select(
            F.explode(full_window_grams(F.col("__toks"), n)).alias("gram")
        )
        .distinct()
        .collect()
    )
    return sorted(r["gram"] for r in grams)


def decontaminate_stream(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    probe_grams: list[str],
    n: int = 8,
) -> DataFrame:
    """Streaming-safe decontamination: drop docs sharing any full
    n-gram with the (pre-collected) probe set. Fully STATELESS — the
    doc's gram array is built row-locally (transform, no explode) and
    tested with ``arrays_overlap`` against the probe literal, so the
    same call runs under Structured Streaming append mode with no
    state store, no watermark, and batch/stream agreement by
    construction. The batch operator (:func:`decontaminate`) is the
    scale path when the probe set is too large to ship in the plan
    (~100k+ grams); this is the ingest-stream path."""
    probe_arr = (
        F.array(*[F.lit(g) for g in probe_grams])
        if probe_grams
        else F.array().cast("array<string>")
    )
    # tokenize in its own projection (not inline in the gram lambdas —
    # see _full_grams), then test and drop the helper column
    with_toks = docs.withColumn(
        "__decon_toks", F.split(normalize_text(text_col), " ")
    )
    hit = F.coalesce(
        F.arrays_overlap(
            full_window_grams(F.col("__decon_toks"), n), probe_arr
        ),
        F.lit(False),
    )
    return with_toks.filter(~hit).drop("__decon_toks")


# The Gopher quality-rule stopword set (Rae et al. 2021, Table A1):
# a doc must contain at least two of these as whole words.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher quality-filter bundle (Rae et al. 2021, Table A1 —
    the public heuristic recipe MassiveWeb shipped, reused by most
    open corpora since): per document, the INTEGER signals behind
    every rule plus the composite ``gopher_pass`` verdict.

    Signals (all exact integers, so the pass is oracle-checkable
    bit-for-bit): ``g_words`` (maximal non-whitespace runs, the same
    explicit ASCII class as :func:`clean_lines`), ``g_word_chars``
    (their summed length — mean word length = chars/words, but the
    BOUND is expressed as integer cross-multiplication so no float
    crosses engines), ``g_symbols`` ('#' chars + non-overlapping
    '...' occurrences + '…' chars — both ellipsis forms, matching the
    ellipsis-line rule), ``g_lines`` / ``g_bullet_lines`` (line starts
    with -, * or •) / ``g_ellipsis_lines`` (line ends with ... or …),
    ``g_alpha_words`` (words containing a-zA-Z), ``g_stop_hits``
    (how many of the 8 Gopher stop words appear as whole \\b-bounded
    words), and the paper's REPETITION-filter structure signals —
    ``g_dup_lines`` / ``g_dup_line_chars`` and ``g_dup_paras`` /
    ``g_dup_para_chars`` (duplicate line/paragraph occurrences beyond
    the first and the characters they carry; paragraphs split on
    blank lines; order-free total-minus-distinct arithmetic). The
    repetition signals inform Gopher's separate repetition gate (with
    :func:`repetition_profile`'s bigram signals) and do NOT enter
    ``gopher_pass``.

    ``gopher_pass`` = the paper's bounds: word count in
    [``min_words``, ``max_words``]; mean word length in [3, 10]
    (3·words ≤ chars ≤ 10·words); symbol-to-word ratio ≤ 0.1
    (10·symbols ≤ words); ≤ 90% bullet lines (10·bullets ≤ 9·lines);
    ≤ 30% ellipsis lines (10·ellipsis ≤ 3·lines); ≥ 80% alphabetic
    words (10·alpha ≥ 8·words); ≥ ``min_stop_hits`` stop words. The
    ratio constants are fixed by the recipe and encoded as exact
    integer comparisons; only the count bounds are parameters. NULL
    text yields all-zero signals and ``gopher_pass = false``.

    Scale: two narrow projections, zero shuffles, zero UDFs — the
    word/line arrays are materialized once (the r6 lambda trap) and
    every rule is whole-stage-codegen Column algebra, so the bundle
    rides any corpus scan for free."""
    c = F.col(text_col)
    p1 = df.select(
        F.col(id_col),
        c.alias("__t"),
        F.regexp_extract_all(c, F.lit(CLEAN_WORD_RE), F.lit(0)).alias(
            "__w"
        ),
        F.split(c, "\n").alias("__l"),
        F.split(c, "\n\n").alias("__p"),
    )
    zero = F.lit(0)
    stop_hits = None
    for w in GOPHER_STOPWORDS:
        hit = F.lower(F.col("__t")).rlike(rf"\b{w}\b").cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    p2 = p1.select(
        F.col(id_col),
        F.coalesce(F.size("__w"), zero).alias("g_words"),
        F.coalesce(
            F.aggregate(
                "__w", F.lit(0), lambda acc, x: acc + F.length(x)
            ),
            zero,
        ).alias("g_word_chars"),
        (
            F.coalesce(
                F.length("__t")
                - F.length(F.replace("__t", F.lit("#"), F.lit(""))),
                zero,
            )
            + F.coalesce(
                F.size(
                    F.regexp_extract_all(
                        "__t", F.lit(r"\.\.\."), F.lit(0)
                    )
                ),
                zero,
            )
            # the unicode ellipsis counts like '...': the paper's
            # symbol-to-word ratio counts ellipses, and the
            # ellipsis-line rule below already accepts both forms
            + F.coalesce(
                F.length("__t")
                - F.length(F.replace("__t", F.lit("…"), F.lit(""))),
                zero,
            )
        ).alias("g_symbols"),
        F.coalesce(F.size("__l"), zero).alias("g_lines"),
        F.coalesce(
            F.size(
                F.filter("__l", lambda x: x.rlike(r"^[ \t]*[-*•]"))
            ),
            zero,
        ).alias("g_bullet_lines"),
        F.coalesce(
            F.size(
                F.filter(
                    "__l", lambda x: x.rlike(r"(\.\.\.|…)[ \t]*$")
                )
            ),
            zero,
        ).alias("g_ellipsis_lines"),
        F.coalesce(
            F.size(F.filter("__w", lambda x: x.rlike("[A-Za-z]"))),
            zero,
        ).alias("g_alpha_words"),
        F.coalesce(stop_hits, zero).alias("g_stop_hits"),
        # Gopher's REPETITION filter signals (applied by the paper as
        # a separate gate, so they ride as signals without entering
        # gopher_pass): duplicate line occurrences beyond the first,
        # and the characters those occurrences carry — both order-free
        # set arithmetic (total minus distinct), exact cross-engine.
        F.coalesce(
            F.size("__l") - F.size(F.array_distinct("__l")), zero
        ).alias("g_dup_lines"),
        F.coalesce(
            F.aggregate(
                "__l", F.lit(0), lambda acc, x: acc + F.length(x)
            )
            - F.aggregate(
                F.array_distinct("__l"),
                F.lit(0),
                lambda acc, x: acc + F.length(x),
            ),
            zero,
        ).alias("g_dup_line_chars"),
        F.coalesce(
            F.size("__p") - F.size(F.array_distinct("__p")), zero
        ).alias("g_dup_paras"),
        F.coalesce(
            F.aggregate(
                "__p", F.lit(0), lambda acc, x: acc + F.length(x)
            )
            - F.aggregate(
                F.array_distinct("__p"),
                F.lit(0),
                lambda acc, x: acc + F.length(x),
            ),
            zero,
        ).alias("g_dup_para_chars"),
    )
    passed = (
        (F.col("g_words") >= F.lit(int(min_words)))
        & (F.col("g_words") <= F.lit(int(max_words)))
        & (F.col("g_word_chars") >= F.lit(3) * F.col("g_words"))
        & (F.col("g_word_chars") <= F.lit(10) * F.col("g_words"))
        & (F.lit(10) * F.col("g_symbols") <= F.col("g_words"))
        & (F.lit(10) * F.col("g_bullet_lines")
           <= F.lit(9) * F.col("g_lines"))
        & (F.lit(10) * F.col("g_ellipsis_lines")
           <= F.lit(3) * F.col("g_lines"))
        & (F.lit(10) * F.col("g_alpha_words")
           >= F.lit(8) * F.col("g_words"))
        & (F.col("g_stop_hits") >= F.lit(int(min_stop_hits)))
    )
    return p2.withColumn("gopher_pass", F.coalesce(passed, F.lit(False)))


def ngram_repetition(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Gopher top-/duplicate-n-gram surfaces for arbitrary ``n`` (Rae
    et al. 2021 §A1.1 filter on n = 2..4 top-gram coverage and
    n = 2..10 duplicate-gram mass; :func:`repetition_profile` ships
    the full n=2 profile, this generalizes the INTEGER core):
    per doc, ``n_ngrams`` (total), ``n_distinct_ngrams``, and
    ``top_ngram_n`` (hottest gram's count) — the exact numerators/
    denominators behind the paper's fractions, kept integer so the
    oracle twin is hash-exact. Docs with fewer than ``n`` tokens get
    zeros.

    Shape: the canonical wordcount — one explode to (doc, gram), one
    map-side-combining count, one per-doc rollup, one join back.
    Never O(tokens²) per row; the shuffle carries (doc, gram) counts
    only."""
    toks = F.split(normalize_text(text_col), " ")
    base = df.select(
        F.col(id_col).alias("id"),
        F.filter(toks, lambda t: t != "").alias("__toks"),
    ).select(
        "id",
        F.coalesce(F.size("__toks"), F.lit(0)).alias("__nt"),
        "__toks",
    )
    grams = base.filter(F.col("__nt") >= int(n)).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("__nt") - F.lit(int(n) - 1)),
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.try_element_at("__toks", i + F.lit(k))
                        for k in range(int(n))
                    ],
                ),
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("id").agg(
        F.sum("c").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct_ngrams"),
        F.max("c").alias("top_ngram_n"),
    )
    zero = F.lit(0).cast("bigint")
    return base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_ngrams", zero).alias("n_ngrams"),
        F.coalesce("n_distinct_ngrams", zero).alias("n_distinct_ngrams"),
        F.coalesce("top_ngram_n", zero).alias("top_ngram_n"),
    )
