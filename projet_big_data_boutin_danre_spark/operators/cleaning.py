"""Format-layer cleaning operators (SURVEY.md §2.2 P6/P7, §2.4 A2, §1.2).

Reference semantics preserved exactly:

- ``coerce_numeric``: pandas ``to_numeric(errors='coerce').fillna(0)``
  (``dags/lib/raw_to_fmt_lbc.py:53``) maps BOTH unparseable strings and
  missing values to 0 — so ``coalesce(cast, 0)``, not a bare cast.
- ``coerce_timestamp``: ``pd.to_datetime(errors='coerce')``
  (``dags/lib/raw_to_fmt_dvf.py:28-29``, ``raw_to_fmt_lbc.py:55``) →
  null on failure; ISO-8601 offsets must parse (LBC dates carry TZ,
  ``dags/lib/lbc_fetcher.py:84-90``).
- ``keep_last_dedup``: ``drop_duplicates(subset=['id'], keep='last')``
  (``dags/lib/raw_to_fmt_lbc.py:49-51``) keeps the LAST occurrence in
  file-concatenation order. Spark's ``dropDuplicates`` keeps an
  *arbitrary* row, so determinism requires an explicit order column +
  ``row_number`` window. Scale note: this is one shuffle on the dedup
  key; at 100 TB the window runs per key-partition with no skew issue
  unless one id dominates (ids are unique-ish by construction).
- ``normalize_location``: the union-typed ``location`` ("N/A" string vs
  struct, ``dags/lib/lbc_fetcher.py:100-108``) becomes a null struct.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import LBC_LOCATION_SCHEMA


def coerce_numeric(col: Column | str, fill: float = 0.0) -> Column:
    """P6: string → double; unparseable, missing AND the literal
    ``'nan'`` all → ``fill``.

    ``try_cast`` (not ``cast``): under ANSI mode — the Spark 4 default —
    a malformed cast throws; the pandas ``errors='coerce'`` contract
    wants null-then-fill. The ``nanvl`` hop closes a subtle gap found
    by property testing: both Spark and DuckDB parse the string
    ``'nan'`` to a float NaN, which is NOT null, so a bare
    ``coalesce`` would let NaN through to poison downstream
    aggregates — while the contract (``to_numeric().fillna(0)``)
    yields ``fill``. Known residual divergence: pandas parses
    ``'inf'``; Spark only ``'Infinity'`` — infinities pass through
    whichever way the engine parses them.

    STRING input only (r19 advisor): the control-char guard below
    routes the value through ``regexp_replace``, which implicitly
    casts its argument to string — a numeric-typed column would take
    a silent double→string→double round trip (and ANSI implicit-cast
    rules may reject it outright). A bare Column/name carries no type
    to dispatch on here, so the contract is documented instead: pass
    the raw string column (every call site does — raw prices,
    ``get_json_object`` output); an already-numeric column needs no
    coercion, use ``try_cast``/``nanvl`` directly.
    """
    c = F.col(col) if isinstance(col, str) else col
    # Control-char guard (r19 — hypothesis found '1\x1f'): Spark's
    # string→double cast trims EVERY char <= 0x20 from both ends
    # (UTF8String.trimAll), while the reference contract — pandas
    # to_numeric and DuckDB TRY_CAST, verified char-by-char, they
    # agree on all of 0x00-0x20 and 0xa0 — trims only real whitespace
    # [\t\n\x0b\f\r ]. So '1\x1f' parsed to 1.0 here but 0.0 under
    # the contract (and under the oracle). Strip the reference-allowed
    # whitespace; any REMAINING boundary char <= 0x20 is unparseable.
    ws = r"[\t\n\x0B\f\r ]"
    t = F.regexp_replace(
        F.regexp_replace(c, f"^{ws}+", ""), f"{ws}+$", ""
    )
    v = F.when(
        t.rlike(r"^[\x00-\x20]") | t.rlike(r"[\x00-\x20]$"),
        F.lit(None).cast("double"),
    ).otherwise(t.try_cast("double"))
    return F.coalesce(
        F.nanvl(v, F.lit(None).cast("double")), F.lit(float(fill))
    )


def coerce_timestamp(col: Column | str) -> Column:
    """P7: string → timestamp, null on failure (ANSI off for this cast).

    ``try_to_timestamp`` parses ISO-8601 with offsets into the session
    timezone; malformed input yields null rather than raising — the
    ``errors='coerce'`` contract.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c)


def keep_last_dedup(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """A2: deterministic keep-last-per-key.

    Keeps, for each key group, the row with the greatest ``order_col``
    (ties broken by ``tiebreak`` columns descending, so the result is a
    function of the data, not of partitioning).

    Physical plan: one hash-exchange on ``keys`` + in-partition sort —
    the minimal cost for any keyed dedup; map-side nothing to combine
    since whole rows are kept.
    """
    order = [F.col(order_col).desc_nulls_last()] + [
        F.col(t).desc_nulls_last() for t in tiebreak
    ]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def normalize_location(df: DataFrame, raw_col: str = "location_json") -> DataFrame:
    """Union-typed location → typed struct (null when "N/A"/missing).

    The raw layer stores either a JSON object or the literal string
    ``"N/A"``. ``from_json`` in permissive mode yields an all-null
    struct (not null) for malformed input, so gate on object syntax:
    non-object input → null struct.
    """
    parsed = F.when(
        F.trim(F.col(raw_col)).startswith("{"),
        F.from_json(F.col(raw_col), LBC_LOCATION_SCHEMA),
    )
    return df.withColumn("location", parsed).drop(raw_col)


def unwrap_scalar(col: Column | str) -> Column:
    """P11: ``price[0] if isinstance(price, list) else price`` — for
    array-typed sources take the first element."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_element_at(c, F.lit(1))


def map_from_attribute_list(col: Column | str) -> Column:
    """P12: ``list[{key,value}]`` → ``map<string,string>``
    (``dags/lib/lbc_fetcher.py:110-114``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.map_from_entries(
        F.transform(c, lambda a: F.struct(a["key"], a["value"]))
    )


def cents_to_euros(col: Column | str) -> Column:
    """P14: ``price_cents/100`` when present and non-zero, else null
    (``dags/lbc/lbc/model/ad.py:106``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull() & (c != 0), c / F.lit(100.0))


def format_ads(
    df: DataFrame,
    raw_col: str = "raw_json",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """The raw→formatted ad pipeline in one projection — the engine's
    re-expression of ``dags/lib/lbc_fetcher.py:100-125`` +
    ``raw_to_fmt_lbc.py:43-58``:

    - P13 defaulted field access: ``list_id`` → ``id``, ``subject`` →
      ``title``
    - P11 list-unwrap + P14 cents→euros on ``price_cents``
    - P7 coercing timestamp on ``date``
    - union-typed ``location`` ("N/A" | object) → typed struct fields
    - P12 attribute list → map, extracted per key

    All JVM-side JSON extraction (``get_json_object``/``from_json``) —
    a narrow map that pipelines with the scan; no shuffle, no UDF.
    """
    raw = F.col(raw_col)
    price_cents = unwrap_scalar(
        F.from_json(F.get_json_object(raw, "$.price_cents"), "array<bigint>")
    )
    loc_txt = F.get_json_object(raw, "$.location")
    loc = F.when(
        F.trim(loc_txt).startswith("{"),
        F.from_json(loc_txt, LBC_LOCATION_SCHEMA),
    )
    attrs = map_from_attribute_list(
        F.from_json(
            F.get_json_object(raw, "$.attributes"),
            "array<struct<key:string,value:string>>",
        )
    )
    return df.select(
        F.get_json_object(raw, "$.list_id").cast("long").alias("id"),
        F.get_json_object(raw, "$.subject").alias("title"),
        cents_to_euros(price_cents).alias("price"),
        coerce_timestamp(F.get_json_object(raw, "$.date")).alias("date"),
        loc.getField("city").alias("city"),
        loc.getField("zipcode").alias("zipcode"),
        F.try_element_at(attrs, F.lit("seg")).alias("seg"),
        # passthrough (e.g. the ingest-order column keep-last dedup
        # needs — the reference carries it implicitly as file order)
        *[F.col(c) for c in extra_cols],
    )


# Read schema for raw LBC ad FILES (what the fetcher json.dump()s,
# ``dags/lib/lbc_fetcher.py:100-129``): union-typed / nested fields are
# declared STRING so the JSON reader hands back their raw JSON text
# ("N/A" included) for the cleaning operators to normalize.
RAW_AD_FILE_SCHEMA = (
    "list_id long, subject string, price_cents array<bigint>, "
    "date string, location string, attributes string"
)


def read_raw_ad_files(spark, path_glob: str) -> DataFrame:
    """Raw JSON-array ad files → one row per array element, carrying
    ``(__ingest_file, __file_pos)``: wholetext read + ``from_json`` +
    ``posexplode``, so the element's position WITHIN its file survives
    the scan. A plain multiLine JSON read yields rows in array order
    but gives downstream operators nothing to order BY — and the
    reference's ``drop_duplicates(keep='last')`` on pandas concat
    order (``raw_to_fmt_lbc.py:33-51``) is exactly (file, position)
    order. Parallelism is per-file (each file is one record) — right
    for fetcher-sized ingest files; the posexplode fans out map-side.

    A file whose content is NOT a parseable JSON array fails LOUDLY
    (in-plan ``raise_error`` naming the file): ``from_json`` yields
    NULL for malformed input and ``posexplode(NULL)`` emits zero rows,
    which would otherwise drop the whole file's ads silently — a
    half-written fetcher output must fail the run, not shrink it."""
    parsed = F.from_json("value", f"array<struct<{RAW_AD_FILE_SCHEMA}>>")
    guarded = F.when(
        parsed.isNull(),
        F.raise_error(
            F.concat(
                F.lit("unparseable raw ad file (not a JSON array): "),
                F.input_file_name(),
            )
        ),
    ).otherwise(parsed)
    return (
        spark.read.option("wholetext", "true")
        .text(path_glob)
        .select(
            F.input_file_name().alias("__ingest_file"),
            F.posexplode(guarded).alias("__file_pos", "__ad"),
        )
        .select("__ad.*", "__ingest_file", "__file_pos")
    )


def format_ads_from_files(df: DataFrame) -> DataFrame:
    """``format_ads`` for ads read straight from the raw JSON-array
    files with ``RAW_AD_FILE_SCHEMA`` (vs. a single raw_json column).
    Same projection, same operators (P7/P11/P12/P13/P14 + location
    normalization) — one narrow JVM-side map, no shuffle.

    Carries ``__ingest_file`` (the source file path) so keep-last
    dedup can use the fetcher's file-concatenation order
    (``raw_to_fmt_lbc.py:33-51``): the fetcher names files by fetch
    timestamp, so lexicographic file order == ingest order. When the
    input came from ``read_raw_ad_files``, ``__file_pos`` passes
    through as the within-file half of that order."""
    loc_txt = F.col("location")
    loc = F.when(
        F.trim(loc_txt).startswith("{"),
        F.from_json(loc_txt, LBC_LOCATION_SCHEMA),
    )
    attrs = map_from_attribute_list(
        F.from_json(
            F.col("attributes"), "array<struct<key:string,value:string>>"
        )
    )
    ingest_file = (
        F.col("__ingest_file")  # carried by read_raw_ad_files: survives
        if "__ingest_file" in df.columns  # persist/checkpoint, unlike
        else F.input_file_name()  # input_file_name() ('' off-scan)
    )
    out = [
        F.col("list_id").alias("id"),
        F.col("subject").alias("title"),
        cents_to_euros(unwrap_scalar(F.col("price_cents"))).alias("price"),
        coerce_timestamp(F.col("date")).alias("date"),
        loc.getField("city").alias("city"),
        loc.getField("zipcode").alias("zipcode"),
        F.try_element_at(attrs, F.lit("seg")).alias("seg"),
        ingest_file.alias("__ingest_file"),
    ]
    if "__file_pos" in df.columns:
        out.append(F.col("__file_pos"))
    return df.select(*out)


def has_cols(df: DataFrame, required: Sequence[str]) -> bool:
    """P10: driver-side schema presence guard
    (``dags/lib/compute_usage.py:36-39``) — metadata only, no job."""
    return set(required).issubset(set(df.columns))


def _profile_aggs(df, max_distinct_cols: int, approx: bool):
    """The aggregate lists behind :func:`profile_table`, returned as
    ``(stats_aggs, distinct_aggs)`` — exposed so plan-shape tests can
    assert the shapes below.

    The split exists because of a physical-planning trap: ``min``/
    ``max`` over string columns carry STRING aggregation buffers,
    which HashAggregate cannot hold (mutable fixed-width buffer types
    only), so any aggregation containing them falls back to
    SortAggregate. With no grouping key that is harmless (nothing to
    sort). But exact multi-column ``countDistinct`` rewrites through
    an Expand node whose partial stages GROUP BY the expanded columns
    — and a grouped SortAggregate sorts the k+1×-expanded scan twice
    on wide keys. Measured at sf0.1 (150k-row orders, 6 columns):
    ~3 s for the combined plan vs ~0.5 s split.

    So: exact distinct counts go in a second, count-only aggregation
    (all-long buffers → HashAggregate end-to-end, Expand but never a
    sort); approx mode keeps everything in one pass (HLL++ sketches
    are fixed-width ImperativeAggregate buffers — hash-friendly, no
    Expand, and the empty-key SortAggregate the string min/max force
    needs no Sort node)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

    stats = [F.count(F.lit(1)).alias("__n")]
    nd = []
    for i, f in enumerate(df.schema.fields):
        c = F.col(f.name)
        stats.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"__null_{i}")
        )
        # map-typed columns are not hashable/comparable as distinct
        # keys in either mode — they report NULL like past-cap columns
        if isinstance(f.dataType, MapType):
            pass
        elif approx:
            stats.append(F.approx_count_distinct(c).alias(f"__nd_{i}"))
        elif i < max_distinct_cols:
            nd.append(F.countDistinct(c).alias(f"__nd_{i}"))
        if not isinstance(
            f.dataType, (StructType, ArrayType, MapType, BinaryType)
        ):
            stats.append(F.min(c).cast("string").alias(f"__min_{i}"))
            stats.append(F.max(c).cast("string").alias(f"__max_{i}"))
    return stats, nd


def profile_table(df, max_distinct_cols: int = 64, approx: bool = False):
    """Generic table profile: one row per column with row count, null
    count, distinct count, and min/max rendered as strings — the
    data-quality snapshot run before trusting any new source.

    Exact mode runs TWO aggregation passes over the scan: a stats
    pass (count / null counts / min / max — no Expand, and its
    empty-key aggregate needs no sort even though string min/max
    buffers force SortAggregate) and a distinct pass (multi-column
    ``countDistinct`` → one Expand node with all-long buffers, so it
    stays in HashAggregate; see :func:`_profile_aggs` for why mixing
    the two forces a double full sort of the expanded scan). The
    Expand cost is MULTIPLICATIVE in data volume, not just plan
    width: an Expand over k distinct-counted columns emits k+1 rows
    per input row before the partial aggregate, so profiling 64
    columns of a 100 TB table pushes ~65× the scanned rows through
    the first aggregation. ``max_distinct_cols`` caps the plan width
    (columns past the cap report NULL rather than silently
    approximating), but the 100 TB answer is ``approx=True``:
    ``approx_count_distinct`` (HLL++) sketches merge map-side in ONE
    single aggregation with the other stats — no Expand node at all,
    one scan (asserted in tests/test_cleaning.py::
    test_profile_table_approx_mode_no_expand) — at the standard ~2%
    relative error. Exact stays the default so oracle-sized tables
    profile exactly. Complex-typed columns (struct/array/map/binary)
    get NULL min/max — orderings are engine-specific.

    Snapshot caveat: exact mode's two jobs read the input TWICE, so a
    source whose files change between them can yield a self-
    inconsistent profile (e.g. n_distinct > n_rows). Profile a
    committed snapshot, or use ``approx=True`` — its single scan
    keeps the old one-pass consistency AND the scale behavior."""
    spark = df.sparkSession
    stats_aggs, nd_aggs = _profile_aggs(df, max_distinct_cols, approx)
    if nd_aggs:
        # r19 (guide §2.6): the stats pass and the distinct pass are
        # INDEPENDENT jobs over the same scan — submitting them from a
        # 2-thread pool lets the second job's tasks back-fill the
        # first's stragglers instead of running strictly after it
        # (actions are only sequential because driver code calls them
        # sequentially). Same two plans, same results; wall-clock is
        # max(join) instead of sum.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_stats = pool.submit(lambda: df.agg(*stats_aggs).collect()[0])
            f_nd = pool.submit(lambda: df.agg(*nd_aggs).collect()[0])
            row, nd_row = f_stats.result(), f_nd.result()
        merged = row.asDict()
        merged.update(nd_row.asDict())
        from pyspark.sql import Row

        row = Row(**merged)
    else:
        row = df.agg(*stats_aggs).collect()[0]
    out = []
    for i, f in enumerate(df.schema.fields):
        out.append(
            (
                f.name,
                f.dataType.simpleString(),
                int(row["__n"]),
                int(row[f"__null_{i}"] or 0),
                int(row[f"__nd_{i}"]) if f"__nd_{i}" in row.asDict() else None,
                row.asDict().get(f"__min_{i}"),
                row.asDict().get(f"__max_{i}"),
            )
        )
    from ..functions.localdf import tiny_df

    return tiny_df(
        spark,
        out,
        "col_name string, col_type string, n_rows bigint, n_nulls bigint,"
        " n_distinct bigint, min_str string, max_str string",
    )


def data_checks(
    df,
    unique: list[list[str]] | None = None,
    non_null: list[str] | None = None,
    accepted: dict[str, list] | None = None,
    ranges: dict[str, tuple] | None = None,
):
    """Declarative data-quality checks (the dbt-test / Deequ idea as
    plain DataFrame ops): one row per check —
    ``(check, target, n_violations, sample_key)`` — zero violations
    everywhere means the layer is safe to publish.

    - ``unique``: list of key column-lists that must be unique;
    - ``non_null``: columns that must never be NULL;
    - ``accepted``: column → allowed literal values;
    - ``ranges``: column → (lo, hi) inclusive bounds (NULLs are NOT
      range violations — declare the column in ``non_null`` too if
      they should be).

    ``sample_key`` carries one offending key/value per failed check
    (min — deterministic) so the report is actionable without a
    second query. Scale shape: the result is fully LAZY — one
    DataFrame the caller collects in a single job. All row-level
    checks (non-null / accepted / range) ride ONE aggregation over a
    single scan (conditional counts + min, nothing but the 1-row
    final combine on the wire), unpivoted to per-check rows with
    ``inline``; each uniqueness check adds one map-side-combined
    groupBy over its key set (shuffle carries distinct keys). Gate
    the pipeline on ``n_violations > 0``."""
    from pyspark.sql import functions as F

    def lit_str(c):
        return F.min(F.when(c.isNotNull(), c.cast("string")))

    def out_row(kind, target, n, sk):
        return F.struct(
            F.lit(kind).alias("check"),
            F.lit(target).alias("target"),
            F.coalesce(n, F.lit(0)).cast("bigint").alias("n_violations"),
            sk.cast("string").alias("sample_key"),
        )

    branches = []
    row_aggs, row_structs = [], []
    for col in non_null or []:
        i = len(row_aggs)
        row_aggs.append(
            F.sum(F.col(col).isNull().cast("long")).alias(f"__a_{i}")
        )
        row_structs.append(
            ("not_null", col, f"__a_{i}", None)
        )
    for col, vals in (accepted or {}).items():
        bad = (~F.col(col).isin(*vals)) & F.col(col).isNotNull()
        i = len(row_aggs)
        row_aggs += [
            F.sum(bad.cast("long")).alias(f"__a_{i}"),
            lit_str(F.when(bad, F.col(col))).alias(f"__a_{i + 1}"),
        ]
        row_structs.append(("accepted_values", col, f"__a_{i}", f"__a_{i + 1}"))
    for col, (lo, hi) in (ranges or {}).items():
        bad = F.col(col).isNotNull() & ~F.col(col).between(
            F.lit(lo), F.lit(hi)
        )
        i = len(row_aggs)
        row_aggs += [
            F.sum(bad.cast("long")).alias(f"__a_{i}"),
            lit_str(F.when(bad, F.col(col))).alias(f"__a_{i + 1}"),
        ]
        row_structs.append(("in_range", col, f"__a_{i}", f"__a_{i + 1}"))

    if row_aggs:
        rows = F.array(
            *[
                out_row(
                    kind,
                    target,
                    F.col(n),
                    F.col(sk) if sk else F.lit(None),
                )
                for kind, target, n, sk in row_structs
            ]
        )
        branches.append(
            df.agg(*row_aggs).select(F.inline(rows))
        )

    for keys in unique or []:
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > 1)
        )
        agg = dup.agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(
                F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
            ).alias("__sk"),
        )
        branches.append(
            agg.select(
                F.inline(
                    F.array(
                        out_row(
                            "unique", "|".join(keys),
                            F.col("__n"), F.col("__sk"),
                        )
                    )
                )
            )
        )

    if not branches:
        from ..functions.localdf import tiny_df

        return tiny_df(
            df.sparkSession,
            [],
            "check string, target string, n_violations bigint,"
            " sample_key string",
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
