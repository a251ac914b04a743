"""Distributed BPE tokenizer training + corpus encoding — the
canonical LLM preprocessing step (Sennrich et al. 2016), shaped for
Spark the way production tokenizer trainers actually work:

- **The corpus-sized stage is ONE wordcount shuffle.** BPE merge
  selection only depends on the word→frequency histogram, never on
  word order or document boundaries, so :func:`word_histogram`
  (explode + map-side-combined groupBy) is the only stage that
  touches every token. The histogram is VOCABULARY-sized — it grows
  with distinct words, not corpus bytes, and is further capped by
  ``max_words`` (keep the most frequent; rare hapaxes contribute
  ~nothing to pair statistics).
- **The merge loop runs on the bounded histogram** (driver-side
  plain Python over ≤``max_words`` rows — the same "bounded model
  state" stance as k-means centroids or pack_sequences' partition
  totals). Each round counts adjacent symbol pairs weighted by word
  frequency and merges the most frequent pair; ties break on the
  lexicographically smallest pair so training is deterministic.
- **Encoding is map-only**: an Arrow-batched pandas UDF with the
  merge ranks broadcast, memoized per distinct word within each
  batch (Zipf makes the memo hit rate very high). No shuffle; the
  plan is scan → project. This is the sanctioned Python-boundary
  case — a tokenizer is genuinely imperative, and the boundary is
  Arrow-vectorized, never row-at-a-time.

Not SQL-expressible (iterative, data-dependent merge order), so this
family is pytest-verified: hand-checked merges on the classic
Sennrich corpus, encode/decode round-trip, and a no-shuffle plan
assertion.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from .text import tokens, tokens_py

END = "</w>"  # end-of-word marker: makes decoding unambiguous


def word_histogram(
    df: DataFrame, text_col: str, max_words: int | None = None
) -> DataFrame:
    """``(word, n)`` corpus word frequencies — the single
    corpus-sized stage of BPE training. With ``max_words``, keeps the
    top-N by (n desc, word) via ``orderBy(...).limit(max_words)``,
    which compiles to ``TakeOrderedAndProject`` — per-partition heaps
    plus a driver merge of ``max_words`` rows. The distinct-word
    histogram of 100 TB of web text is itself huge (hapax URLs and
    typos run to billions of rows), so the cap must prune
    per-partition rather than rank on a single reducer; the (n desc,
    word) ordering keeps the cut deterministic under ties either
    way."""
    out = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if max_words is not None:
        out = out.orderBy(F.col("n").desc(), F.col("word")).limit(max_words)
    return out


def _word_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence: characters, with the end-of-word
    marker fused onto the last one."""
    if not word:
        return ()
    chars = list(word)
    chars[-1] = chars[-1] + END
    return tuple(chars)


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += n
    return pairs


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_hist: DataFrame | list[tuple[str, int]],
    n_merges: int,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word histogram (a
    DataFrame from :func:`word_histogram`, or (word, n) pairs).
    Returns the ordered merge list — rank = list position. Stops
    early when no pair occurs twice (merging hapax pairs memorizes
    the corpus, not subword structure).

    The histogram collect is the deliberate driver boundary: BPE
    statistics live on vocabulary-sized data by construction, and the
    loop is O(n_merges × vocab) — cap the histogram with
    ``max_words`` upstream, not here."""
    if isinstance(word_hist, DataFrame):
        rows = [(r[0], int(r[1])) for r in word_hist.collect()]
    else:
        rows = [(w, int(n)) for w, n in word_hist]
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in rows:
        syms = _word_symbols(w)
        if syms:
            vocab[syms] = vocab.get(syms, 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # deterministic argmax: highest count, then smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        vocab = {
            _merge_word(syms, best): n for syms, n in vocab.items()
        }
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word: repeatedly merge the lowest-rank
    adjacent pair present (the standard BPE encode order — NOT
    training order re-run, which would be O(merges × len))."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize the corpus with a trained merge list:
    ``(id, bpe_tokens array<string>, n_bpe)``. Map-only — the merge
    ranks ride the closure (KB-sized), each Arrow batch memoizes
    encoded words, no shuffle."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def enc_text(t):
            out: list[str] = []
            for w in tokens_py(t):
                if w not in memo:
                    memo[w] = encode_word(w, ranks)
                out.extend(memo[w])
            return out

        return pd.Series([enc_text(t) for t in texts])

    return df.select(
        id_col, enc(F.col(text_col)).alias("bpe_tokens")
    ).withColumn("n_bpe", F.size("bpe_tokens"))


def decode(tokens_list: list[str]) -> str:
    """Inverse of :func:`encode` for one document: concatenate
    symbols, split words on the end-of-word marker."""
    return " ".join(
        w for w in "".join(tokens_list).split(END) if w != ""
    )
