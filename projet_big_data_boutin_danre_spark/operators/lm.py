"""Count-based n-gram language-model training and document scoring —
the "perplexity filter" of corpus pipelines (CCNet, Wenzek et al.
2020: score web documents with a small LM trained on a trusted
corpus, drop the high-perplexity tail). Public-knowledge design: a
plain count-based LM with add-k smoothing, expressed entirely as
DataFrame aggregations and joins.

Scale shape:

- **Training** is one wordcount-style shuffle: explode (context,
  word) n-grams with map-side partial aggregation, so the shuffle
  carries (ctx, w, partial_count) rows — model-sized, not
  corpus-sized. ``min_count`` prunes the long tail (the standard way
  the model stays broadcastable).
- **Scoring** re-derives each document's n-grams (same explode
  budget as training) and joins them against the model. In the
  canonical deployment the model is trained on a SMALL trusted
  corpus (e.g. an encyclopedia slice) and broadcast — scoring is
  then map-only. Self-trained corpus-sized models fall back to a
  shuffle join keyed on (ctx, w); either way the document text never
  fans out beyond its own n-grams.
- Per-document reduction is a single groupBy with map-side combine.

Cross-engine determinism: the integer surfaces (gram counts, model
hits, summed model counts) are exact and oracle-checkable. The float
surfaces (log-probability, perplexity) are kept OUT of oracle slots:
``ln`` is not bit-identical across engines and float summation is
order-dependent — they are pinned by pytest on hand-computed
fixtures instead.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens


def _doc_ngrams(
    df: DataFrame, keep_cols: list[str], text_col: str, n: int
) -> DataFrame:
    """One row per n-gram occurrence: ``keep_cols + (ctx, w)`` where
    ``ctx`` is the space-joined (n-1)-token context and ``w`` the
    predicted token. Documents with fewer than ``n`` tokens emit no
    rows. The explode is the same fan-out budget as shingling: one
    row per token position, never quadratic."""
    if n < 2:
        raise ValueError("ngram order n must be >= 2")
    # Materialize the token array FIRST: the transform lambda below
    # references the array per position, and a lambda capturing the
    # raw tokens() EXPRESSION would re-run the normalize regexes +
    # split for every token position (O(len × regex) per doc —
    # measured 15 s vs <1 s at sf0.1). An attribute reference makes
    # each access a plain array lookup.
    base = df.select(*keep_cols, tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    # sequence(1, 0) would yield a DESCENDING [1, 0] in Spark — guard
    # short docs explicitly with an empty array instead
    idx = F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(toks, i, n - 1)).alias("ctx"),
            F.element_at(toks, i + (n - 1)).alias("w"),
        ),
    )
    return base.select(
        *keep_cols, F.explode(grams).alias("__g")
    ).select(*keep_cols, F.col("__g.ctx").alias("ctx"), F.col("__g.w").alias("w"))


def doc_ngrams(
    df: DataFrame, keep_cols: list[str], text_col: str, n: int = 2
) -> DataFrame:
    """Public handle on the shared gram subplan: one row per n-gram
    occurrence, ``keep_cols + (ctx, w)``. Training, context totals,
    and scoring all consume this frame — compute it ONCE (and
    ``localCheckpoint`` it when feeding several of them) instead of
    paying the tokenize+explode scan per consumer."""
    return _doc_ngrams(df, keep_cols, text_col, n)


def ngram_counts(
    df: DataFrame,
    text_col: str | None = None,
    n: int = 2,
    min_count: int = 1,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Train: ``(ctx, w, c)`` n-gram counts over the corpus, pruned to
    ``c >= min_count``. One explode + one map-side-combined groupBy —
    the shuffle carries partial counts, not token streams. Pass a
    precomputed ``grams`` frame (from :func:`doc_ngrams`) to reuse a
    shared gram subplan."""
    g = grams if grams is not None else _doc_ngrams(df, [], text_col, n)
    out = g.groupBy("ctx", "w").agg(F.count(F.lit(1)).alias("c"))
    if min_count > 1:
        out = out.filter(F.col("c") >= min_count)
    return out


def context_totals(
    df: DataFrame,
    text_col: str | None = None,
    n: int = 2,
    grams: DataFrame | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """``(ctx, c_ctx)``: how often each (n-1)-token context occurs in
    the training corpus (UNpruned — the smoothing denominator must
    count every occurrence or pruned-away mass would inflate
    probabilities). Accepts a precomputed ``grams`` frame like
    :func:`ngram_counts` — or better, the UNPRUNED ``counts`` frame
    from ``ngram_counts(min_count=1)``: c(ctx) = Σ_w c(ctx, w), so
    the rollup then runs over model-sized rows instead of re-scanning
    the corpus-sized gram stream (the right derivation at 100 TB)."""
    if counts is not None:
        return counts.groupBy("ctx").agg(
            F.sum("c").cast("bigint").alias("c_ctx")
        )
    g = grams if grams is not None else _doc_ngrams(df, [], text_col, n)
    return g.groupBy("ctx").agg(F.count(F.lit(1)).alias("c_ctx"))


def score_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    ctx_tot: DataFrame,
    n: int = 2,
    add_k: float = 1.0,
    vocab_size: int | None = None,
    broadcast_model: bool = False,
    grams: DataFrame | None = None,
    with_ppl: bool = True,
) -> DataFrame:
    """Score every document against a trained n-gram model:

    ``(id, lm_grams, lm_hits, lm_c, lm_ctx, avg_logp, ppl)`` —
    n-gram count, how many hit the (pruned) model, summed model
    counts and context totals (all integer-exact), plus the add-k
    smoothed mean log-probability and perplexity::

        P(w | ctx) = (c(ctx, w) + k) / (c(ctx) + k * V)
        ppl = exp(-mean(ln P))

    ``vocab_size`` (V) defaults to the number of distinct predicted
    tokens in the model — pass the training vocab size explicitly
    when the model was pruned hard. Documents shorter than ``n``
    tokens are absent from the result (no grams); callers left-join
    and coalesce.

    Pass ``broadcast_model=True`` when the model comes from a small
    trusted corpus (the CCNet deployment) — scoring then runs
    map-only. Self-trained corpus-wide models should leave it False
    and let the (ctx, w)-keyed shuffle join handle model size.

    ``with_ppl=False`` drops the two float columns AND the
    vocab-size computation that feeds them (the only driver-side
    action in this function — V is a one-row model statistic, but
    skipping it saves a whole job when the caller only wants the
    integer digest, e.g. an oracle slot)."""
    m = model.select("ctx", "w", "c")
    ct = ctx_tot.select("ctx", "c_ctx")
    if broadcast_model:
        m, ct = F.broadcast(m), F.broadcast(ct)
    if grams is None:
        grams = _doc_ngrams(df, [id_col], text_col, n)
    joined = grams.join(m, ["ctx", "w"], "left").join(ct, ["ctx"], "left")
    aggs = [
        F.count(F.lit(1)).alias("lm_grams"),
        F.sum(
            F.when(F.col("c").isNotNull(), 1).otherwise(0)
        ).alias("lm_hits"),
        F.sum(F.coalesce("c", F.lit(0))).alias("lm_c"),
        F.sum(F.coalesce("c_ctx", F.lit(0))).alias("lm_ctx"),
    ]
    if not with_ppl:
        return joined.groupBy(id_col).agg(*aggs)
    if vocab_size is None:
        vocab_size = model.select("w").distinct().count()
    k = float(add_k)
    logp = F.log(
        (F.coalesce("c", F.lit(0)) + F.lit(k))
        / (F.coalesce("c_ctx", F.lit(0)) + F.lit(k * float(vocab_size)))
    )
    out = joined.groupBy(id_col).agg(*aggs, F.avg(logp).alias("avg_logp"))
    return out.withColumn("ppl", F.exp(-F.col("avg_logp")))


def perplexity_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    ctx_tot: DataFrame,
    max_ppl: float,
    n: int = 2,
    add_k: float = 1.0,
    vocab_size: int | None = None,
    broadcast_model: bool = False,
    grams: DataFrame | None = None,
) -> DataFrame:
    """The CCNet gate: keep documents whose model perplexity is at
    most ``max_ppl``. Documents with fewer than ``n`` tokens have no
    perplexity and are DROPPED (a doc the LM cannot score is not
    evidence of fluency). Composition: score → filter → semi-join
    back, so the kept frame carries the original columns and the text
    column never rides the scoring shuffle. ``grams`` passes a
    precomputed :func:`doc_ngrams` frame straight through to the
    scoring join (when the model was self-trained from the same
    frame, the corpus then tokenizes exactly once)."""
    scored = score_documents(
        df, id_col, text_col, model, ctx_tot,
        n=n, add_k=add_k, vocab_size=vocab_size,
        broadcast_model=broadcast_model, grams=grams,
    )
    keep = scored.filter(F.col("ppl") <= max_ppl).select(id_col)
    return df.join(keep, id_col, "left_semi")


_GRAM_SEP = "\x1f"


def ppl_gate_stream(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    model_counts: dict[tuple[str, str], int],
    ctx_counts: dict[str, int],
    max_ppl: float,
    n: int = 2,
    add_k: float = 1.0,
    vocab_size: int | None = None,
    max_model_entries: int = 4000,
) -> DataFrame:
    """Streaming-safe perplexity gate: the same add-k bigram score as
    :func:`score_documents`, computed ROW-LOCALLY so it runs under
    Structured Streaming append mode with no state store, no
    watermark, and batch/stream agreement by construction (the
    decontaminate_stream pattern). The model arrives as pre-collected
    dicts — bounded driver state by contract, which is exactly the
    CCNet deployment (a small trusted-corpus model), shipped into the
    plan as constant-folded literal maps.

    Per row: the token array materializes once in its own projection,
    the gram array builds via ``transform`` (no explode), and one
    ``aggregate`` fold sums the smoothed log-probs against the two
    literal maps. Docs with fewer than ``n`` tokens have no
    perplexity and are dropped, matching :func:`perplexity_filter`.

    Cost contract: literal maps are array-backed in Spark, so each
    lookup is LINEAR in model size — right for gate models up to a
    few thousand entries; past that, use the batch operator's
    broadcast join (hash lookup) via foreachBatch instead. The
    contract is ENFORCED: more than ``max_model_entries`` total
    literal-map entries raises rather than silently degrading plan
    build, codegen, and per-row cost (raise the cap explicitly only
    with a measured reason)."""
    n_entries = len(model_counts) + len(ctx_counts)
    if n_entries > max_model_entries:
        raise ValueError(
            f"model ships {n_entries} literal-map entries > "
            f"max_model_entries={max_model_entries}: element_at over a "
            "literal map is LINEAR in its size, so an oversized model "
            "degrades every row it scores — score with the batch "
            "broadcast-join path (lm.perplexity_filter inside "
            "foreachBatch) instead, or raise max_model_entries if the "
            "cost is measured and acceptable"
        )
    if vocab_size is None:
        vocab_size = len({w for (_, w) in model_counts})
    k = float(add_k)
    kv = k * float(max(vocab_size, 1))

    def lit_map(d: dict) -> Column:
        if not d:
            return F.map_from_arrays(
                F.array().cast("array<string>"),
                F.array().cast("array<long>"),
            )
        items = []
        for key, v in d.items():
            items += [F.lit(key), F.lit(int(v))]
        return F.create_map(*items)

    mmap = lit_map(
        {f"{c}{_GRAM_SEP}{w}": v for (c, w), v in model_counts.items()}
    )
    cmap = lit_map(dict(ctx_counts))

    with_toks = docs.withColumn("__lm_toks", tokens(text_col))
    toks = F.col("__lm_toks")
    idx = F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(toks, i, n - 1)).alias("ctx"),
            F.element_at(toks, i + (n - 1)).alias("w"),
        ),
    )
    logp_sum = F.aggregate(
        grams,
        F.lit(0.0),
        lambda acc, g: acc
        + F.log(
            (
                F.coalesce(
                    F.element_at(
                        mmap,
                        F.concat(g["ctx"], F.lit(_GRAM_SEP), g["w"]),
                    ),
                    F.lit(0),
                )
                + F.lit(k)
            )
            / (
                F.coalesce(F.element_at(cmap, g["ctx"]), F.lit(0))
                + F.lit(kv)
            )
        ),
    )
    ng = F.size(grams)
    ppl = F.when(ng > 0, F.exp(-logp_sum / ng.cast("double")))
    return (
        with_toks.withColumn("__ppl", ppl)
        .filter(F.col("__ppl") <= F.lit(float(max_ppl)))
        .drop("__lm_toks", "__ppl")
    )


def collect_model(
    model: DataFrame, ctx_tot: DataFrame
) -> tuple[dict[tuple[str, str], int], dict[str, int]]:
    """Collect a trained model into the dict form
    :func:`ppl_gate_stream` ships in its plan — the explicit,
    size-visible driver boundary (same contract as
    text.probe_gram_set)."""
    m = {(r["ctx"], r["w"]): int(r["c"]) for r in model.collect()}
    c = {r["ctx"]: int(r["c_ctx"]) for r in ctx_tot.collect()}
    return m, c


def importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_model: DataFrame,
    target_ctx: DataFrame,
    source_model: DataFrame,
    source_ctx: DataFrame,
    n: int = 2,
    add_k: float = 1.0,
    target_vocab: int | None = None,
    source_vocab: int | None = None,
    broadcast_models: bool = True,
    materialize_grams: bool = False,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per document,
    ``log_w = mean log P_target - mean log P_source`` under two n-gram
    LMs — positive means the doc looks more like the TARGET
    distribution (e.g. curated text) than the raw SOURCE pool.
    Returns ``(id, logp_target, logp_source, log_w)``.

    Both scorings share ONE gram derivation. With
    ``materialize_grams=True`` the shared frame is
    ``localCheckpoint``-ed so the corpus genuinely pays a single
    tokenize+explode — without it the two scoring branches each
    recompute the gram subplan (Spark reuses no un-materialized
    subtree across actions). The tradeoff is NOT only storage:
    ``localCheckpoint`` pins an explode-sized frame (a multiple of
    the corpus) on executor block storage AND truncates lineage — a
    lost executor then FAILS the job instead of recomputing the lost
    blocks, while the two-scan plan is fully recoverable. The default
    is ``False`` because this operator's design point is the 100 TB
    corpus: two recoverable scans beat pinning corpus-×-n grams on
    executors that churn (the same call the corpus_pipeline LM gate
    makes, which checkpoints only the MODEL-sized counts, never the
    gram frame). Set ``True`` for single-node / small-cluster runs
    where the frame fits, executors don't churn, and the second scan
    is the dominant cost.

    ``target_vocab``/``source_vocab``: pass the training vocab sizes
    when known — when either is unset, ONE driver job derives both
    from the models' distinct predicted tokens at plan-build time
    (still eager, but one job instead of the two that per-call
    defaulting inside :func:`score_documents` would run)."""
    grams = _doc_ngrams(df, [id_col], text_col, n)
    if materialize_grams:
        grams = grams.localCheckpoint()
    if target_vocab is None or source_vocab is None:
        sides = (
            target_model.select(F.lit(0).alias("__side"), "w")
            .unionByName(source_model.select(F.lit(1).alias("__side"), "w"))
            .distinct()
            .groupBy("__side")
            .agg(F.count(F.lit(1)).alias("v"))
        )
        vs = {r["__side"]: int(r["v"]) for r in sides.collect()}
        if target_vocab is None:
            target_vocab = vs.get(0, 0)
        if source_vocab is None:
            source_vocab = vs.get(1, 0)
    t = score_documents(
        df, id_col, text_col, target_model, target_ctx, n=n,
        add_k=add_k, vocab_size=target_vocab,
        broadcast_model=broadcast_models, grams=grams,
    ).select(id_col, F.col("avg_logp").alias("logp_target"))
    s = score_documents(
        df, id_col, text_col, source_model, source_ctx, n=n,
        add_k=add_k, vocab_size=source_vocab,
        broadcast_model=broadcast_models, grams=grams,
    ).select(id_col, F.col("avg_logp").alias("logp_source"))
    return t.join(s, id_col).withColumn(
        "log_w", F.col("logp_target") - F.col("logp_source")
    )


def importance_resample(
    weighted: DataFrame,
    id_col: str,
    n_out: int,
    seed: int = 0,
    temperature: float = 1.0,
) -> DataFrame:
    """Deterministic Gumbel-top-k resampling over importance weights:
    sampling n_out docs WITHOUT replacement with probability ∝
    exp(log_w / temperature) is exactly "take the n_out largest
    ``log_w/T + Gumbel(0,1)`` keys" (the Gumbel-max trick). The
    Gumbel noise derives from md5(seed|id) so the sample is
    re-run-stable — the same determinism contract as
    stratified_sample. One TakeOrderedAndProject, no full sort."""
    # uniform in (0,1) from the top 13 hex chars (52 bits — full
    # double mantissa), then g = -ln(-ln(u))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col))),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16 ** 13))
    gumbel = -F.log(-F.log(u))
    key = F.col("log_w") / F.lit(float(temperature)) + gumbel
    return (
        weighted.withColumn("__gk", key)
        .orderBy(F.col("__gk").desc())
        .limit(int(n_out))
        .drop("__gk")
    )


def reference_ppl(
    texts: list[str],
    doc: str,
    n: int = 2,
    add_k: float = 1.0,
    min_count: int = 1,
) -> float | None:
    """Driver-side reference implementation (plain Python) used by
    tests to pin the distributed math. Returns None for unscorable
    docs."""

    from .text import tokens_py

    def grams(t: str):
        tk = tokens_py(t)
        return [
            (" ".join(tk[i : i + n - 1]), tk[i + n - 1])
            for i in range(len(tk) - n + 1)
        ]

    from collections import Counter

    counts: Counter = Counter()
    ctx: Counter = Counter()
    for t in texts:
        for g in grams(t):
            counts[g] += 1
            ctx[g[0]] += 1
    model = {g: c for g, c in counts.items() if c >= min_count}
    vocab = len({w for (_, w) in model})
    gs = grams(doc)
    if not gs:
        return None
    lp = [
        math.log(
            (model.get(g, 0) + add_k) / (ctx.get(g[0], 0) + add_k * vocab)
        )
        for g in gs
    ]
    return math.exp(-sum(lp) / len(lp))
