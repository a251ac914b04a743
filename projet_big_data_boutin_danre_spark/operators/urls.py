"""URL / domain hygiene — the pre-content gate of a web-scale
training pipeline (engine extension; no counterpart in the reference,
which scrapes a single API).

Real corpora gate on URLs BEFORE any content runs: C4 applies domain
blocklists, RefinedWeb deduplicates by canonicalized URL before
MinHash ever sees text, and domain rollups drive both blocklists and
mixing weights. The operators here are pure Column algebra (no UDFs,
no shuffles beyond the final aggregates), built from a small
cross-engine-safe toolkit — anchored RE2/Java-compatible regexes
(no shorthand classes), so every step has an exact DuckDB twin.

Canonicalization recipe (the common core of C4/RefinedWeb-style
canonicalizers, documented choice by choice):

1. scheme and host lowercased;
2. a leading ``www.`` label stripped;
3. default ports dropped (``:443`` for https, ``:80`` for http);
   non-default ports KEPT (a different port is a different origin);
4. trailing slashes stripped from the path;
5. tracking query parameters removed (``utm_*``, ``fbclid``,
   ``gclid``); remaining parameters keep their ORDER (sorting them
   canonicalizes harder but merges ``?a=1&b=2`` with ``?b=2&a=1`` —
   rarely the same resource in practice and not worth the list ops);
6. the fragment dropped.

Scale: the canonicalizer is a map-only projection (whole-stage
codegen); ``url_dedup_groups`` / ``domain_rollup`` are single
hash aggregates on short string keys with map-side partial
aggregation — the same shape as ``exact_dedup_stats``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# anchored, RE2+Java-safe (no \s/\S — the r9 cross-engine rule)
_RE_SCHEME = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_RE_HOSTPORT = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_RE_PATH = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_RE_QUERY = "^[^#]*[?]([^#]*)"
_RE_PORT = ":([0-9]+)$"
_RE_PORT_STRIP = ":[0-9]+$"
# param boundary is made explicit by prepending '&' to the query, so
# tracking params are removable with ONE global regexp_replace — no
# list lambdas, identical semantics in Spark and DuckDB ('g' flag)
_RE_TRACKING = "&(utm_[^&]*|fbclid=[^&]*|gclid=[^&]*)"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme; '' for a scheme-less string."""
    return F.lower(F.regexp_extract(url, _RE_SCHEME, 1))


def url_host(url: Column) -> Column:
    """Canonical host: userinfo (``user:pass@``) stripped, lowercased,
    port and leading ``www.`` stripped."""
    hostport = F.regexp_replace(
        F.regexp_extract(url, _RE_HOSTPORT, 1), "^[^@]*@", ""
    )
    host = F.lower(F.regexp_replace(hostport, _RE_PORT_STRIP, ""))
    return F.regexp_replace(host, "^www[.]", "")


def registered_domain(
    url: Column, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """Approximate registered domain: the last two host labels
    (``a.b.site.ex3.com`` → ``ex3.com``), exact for all generic TLDs.

    ``extra_suffixes`` (r15 advisor) patches the ccTLD gap without a
    full PSL: any lowercase two-label public suffix listed there
    (``co.uk``, ``com.au``, …) shifts the extract to THREE labels, so
    ``news.bbc.co.uk`` → ``bbc.co.uk`` instead of the unusable
    ``co.uk`` — which a blocklist could otherwise neither name (a
    site under it never matches) nor list (it would block the whole
    ccTLD). Column algebra only: one extra anchored extract plus an
    ``isin`` over the (small, literal) suffix set. A faithful
    public-suffix split still needs the full PSL — this is the
    documented swap point; the two-label default stays exact for the
    synthetic corpus and every oracle twin."""
    host = url_host(url)
    last2 = F.regexp_extract(host, "([^.]+[.][^.]+)$", 1)
    if not extra_suffixes:
        return last2
    last3 = F.regexp_extract(host, "([^.]+[.][^.]+[.][^.]+)$", 1)
    return F.when(
        last2.isin([s.lower() for s in extra_suffixes]) & (last3 != ""),
        last3,
    ).otherwise(last2)


def canonicalize_url(url: Column) -> Column:
    """The full canonical form (module docstring recipe) as a single
    map-only Column expression.

    Unparseable input — no ``scheme://`` or an empty host — yields
    NULL, not a degenerate string (r14 fix): collapsing every
    scheme-less string to ``'://'`` would FALSELY MERGE unrelated
    docs in :func:`url_dedup_groups` and make the ingest url_guard
    block them against each other; NULL means "no URL evidence"
    everywhere downstream (admitted, out of the sidecar — the
    NULL-payload rule)."""
    scheme = url_scheme(url)
    hostport = F.regexp_replace(
        F.regexp_extract(url, _RE_HOSTPORT, 1), "^[^@]*@", ""
    )
    port = F.regexp_extract(hostport, _RE_PORT, 1)
    host = url_host(url)
    keep_port = (
        (port != "")
        & ~((scheme == "https") & (port == "443"))
        & ~((scheme == "http") & (port == "80"))
    )
    portpart = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
        F.lit("")
    )
    path = F.regexp_replace(
        F.regexp_extract(url, _RE_PATH, 1), "/+$", ""
    )
    query = F.regexp_extract(url, _RE_QUERY, 1)
    q_clean = F.regexp_replace(
        F.regexp_replace(F.concat(F.lit("&"), query), _RE_TRACKING, ""),
        "^&+",
        "",
    )
    querypart = F.when(
        q_clean != "", F.concat(F.lit("?"), q_clean)
    ).otherwise(F.lit(""))
    return F.when(
        (scheme == "") | (host == ""), F.lit(None).cast("string")
    ).otherwise(
        F.concat(scheme, F.lit("://"), host, portpart, path, querypart)
    )


def url_dedup_groups(
    df: DataFrame, id_col: str, url_col: str
) -> DataFrame:
    """RefinedWeb-style URL dedup decision table: one row per
    CANONICAL url with the deterministic keeper (min id) and the copy
    count — consumers keep rows where ``id == keeper_id`` (or
    anti-join the rest), before any content-level dedup runs. One
    hash aggregate on the canonical string key. Rows whose url does
    not canonicalize (NULL — no URL evidence) are EXCLUDED from the
    groups: merging them would treat every unparseable string as one
    page; consumers keep them as singletons."""
    return (
        df.select(
            F.col(id_col),
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
        )
        .filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def domain_rollup(
    df: DataFrame,
    id_col: str,
    url_col: str,
    weight_col: str | None = None,
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Per-registered-domain aggregate — the table a domain blocklist
    or a mixing-weight recipe is built from: doc count plus an
    optional summed weight (chars, tokens, bytes). One hash
    aggregate; at 100 TB the result is domains-sized (millions of
    rows), trivially collectable or joinable as a broadcast dim.
    ``extra_suffixes`` passes through to :func:`registered_domain`
    (ccTLD rollup — ``bbc.co.uk`` rows otherwise land under
    ``co.uk``)."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if weight_col is not None:
        aggs.append(
            F.sum(F.col(weight_col).cast("bigint")).alias("total_weight")
        )
    return (
        df.select(
            F.col(id_col),
            registered_domain(
                F.col(url_col), extra_suffixes=extra_suffixes
            ).alias("domain"),
            *([F.col(weight_col)] if weight_col is not None else []),
        )
        .filter(F.col("domain") != "")  # no domain evidence -> out
        .groupBy("domain")
        .agg(*aggs)
    )


def synth_urls(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic messy-URL substrate over the documents table
    (the synth_media_from_documents precedent): four variants —
    mixed case, explicit default port, ``www.`` prefix, trailing
    slash, tracking params in different positions, fragments — that
    all canonicalize to the SAME url per (doc_id % 211) group, so the
    dedup groups prove the canonicalizer does real merging work.
    ~211 canonical urls across 13 registered domains."""
    # domain and path derive from the GROUP key g (not doc_id), so a
    # group's members differ only in messy-variant dressing — while
    # the variant itself cycles on doc_id (gcd(211, 4) = 1, so every
    # group of >= 4 members sees every variant)
    g = (F.col(id_col) % 211).cast("string")
    d = ((F.col(id_col) % 211) % 13).cast("string")
    p = ((F.col(id_col) % 211) % 7).cast("string")
    host = F.concat(F.lit("site"), g, F.lit(".ex"), d, F.lit(".com"))
    v = F.col(id_col) % 4
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("https://www."), host, F.lit("/a/b"), p,
                F.lit("?id="), g, F.lit("&utm_source=feed"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("HTTPS://"), F.upper(host), F.lit(":443/a/b"), p,
                F.lit("/?id="), g,
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://"), host, F.lit("/a/b"), p,
                F.lit("?utm_medium=x&id="), g, F.lit("#frag"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://www."), host, F.lit(":443/a/b"), p,
                F.lit("?id="), g, F.lit("&gclid=zz"),
            ),
        )
    )
    return docs.withColumn("url", url)
