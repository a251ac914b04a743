"""SearchSpec → Column compiler (SURVEY.md §2.8 — the reference's
declarative query surface).

The reference compiles a search spec into a remote JSON payload
(``dags/lbc/lbc/utils.py:154-277``: keywords, category, enums, ranges,
geo, owner_type, shippable, sort, pagination) and ships it to
api.leboncoin.fr. This engine compiles the same spec into a Spark
filter/sort/page plan over a local table — so the predicate pushdown
the reference hand-rolls (X1) falls out of Catalyst for free.

Also includes the URL→spec parser (Q11, ``utils.py:6-152``): a pure-
Python re-expression of the reference's match/case over query params.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import parse_qsl, urlsplit

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.geo import within_radius_km
from ..operators.pagination import sort_page

def _normalize_py(s: str) -> str:
    """Python twin of functions.hashing.normalize_text for QUERY-side
    tokenization (the query is a driver literal, so normalizing it in
    Python keeps the plan free of a per-row normalize of a constant)."""
    import re

    return re.sub(" +", " ", re.sub("[^a-z0-9]+", " ", s.lower())).strip()


# sort_by → (column attr, default direction) — mirrors the Sort enum
# (dags/lbc/lbc/model/enums.py:12-17): relevance/date/price.
_SORTS = {
    "time": "date",
    "price": "price",
}


@dataclass
class SearchSpec:
    """Declarative search over an ads-like table.

    Field-for-field re-expression of the reference payload builder's
    arguments (``dags/lbc/lbc/mixin/search.py:7-22``).
    """

    text: str | None = None                      # Q1 keywords.text
    search_in_title_only: bool = False           # Q1 type='subject'
    # Q1 match semantics: "substring" (the reference's contains) or
    # "all_tokens" (SURVEY Q1 stretch — every query token must appear
    # as a WHOLE token of the haystack, any order, case/punct
    # insensitive: the search-engine keyword semantic). Tokenization
    # is the engine's canonical normalize (lowercase, non-alnum →
    # space) on BOTH the query (Python-side, compiled to literals)
    # and the haystack (Column-side) — identical in the SQL oracle.
    text_match: str = "substring"
    category: str | None = None                  # Q2 filters.category.id
    enums: dict[str, list[str]] = field(default_factory=dict)   # Q3
    ranges: dict[str, tuple[float | None, float | None]] = field(
        default_factory=dict
    )                                            # Q4 {col: (min,max)}
    # Q5/Q7 geo radius: (lat, lng, radius_km)
    geo_radius: tuple[float, float, float] | None = None
    department_id: str | None = None             # Q6
    region_id: str | None = None                 # Q6
    owner_type: str | None = None                # Q8 pro|private|all
    shippable: bool | None = None                # Q9
    sort_by: str | None = None                   # Q10: time|price|None
    sort_asc: bool = False
    limit: int = 35                              # Q10 (default utils.py:27)
    page: int = 1

    # column bindings — how spec fields map onto the target table
    text_cols: tuple[str, ...] = ("title",)
    category_col: str = "category_id"
    owner_col: str = "owner_type"
    shippable_col: str = "shippable"
    lat_col: str = "lat"
    lng_col: str = "lng"
    department_col: str = "department_id"
    region_col: str = "region_id"
    id_col: str = "id"


def compile_predicate(spec: SearchSpec) -> Column | None:
    """Compile the spec's filters into one Column predicate (or None
    when unfiltered). Every clause is sargable — Catalyst pushes the
    conjunction into the scan."""
    clauses: list[Column] = []
    if spec.text:
        cols = (
            spec.text_cols[:1] if spec.search_in_title_only else spec.text_cols
        )
        hay = F.concat_ws(" ", *[F.coalesce(F.col(c), F.lit("")) for c in cols])
        if spec.text_match == "all_tokens":
            from ..functions.hashing import normalize_text

            toks = F.split(normalize_text(hay), " ")
            q_toks = [t for t in _normalize_py(spec.text).split(" ") if t]
            for t in q_toks:
                clauses.append(F.array_contains(toks, t))
        elif spec.text_match == "substring":
            clauses.append(hay.contains(spec.text))
        else:
            raise ValueError(
                f"unknown text_match {spec.text_match!r} — "
                "'substring' or 'all_tokens'"
            )
    if spec.category is not None:
        clauses.append(F.col(spec.category_col) == F.lit(spec.category))
    for col_name, values in spec.enums.items():
        clauses.append(F.col(col_name).isin(*values))
    for col_name, (lo, hi) in spec.ranges.items():
        c = F.col(col_name)
        if lo is not None and hi is not None:
            clauses.append(c.between(lo, hi))
        elif lo is not None:
            clauses.append(c >= F.lit(lo))
        elif hi is not None:
            clauses.append(c <= F.lit(hi))
    if spec.geo_radius is not None:
        lat, lng, radius = spec.geo_radius
        clauses.append(
            within_radius_km(F.col(spec.lat_col), F.col(spec.lng_col), lat, lng, radius)
        )
    if spec.department_id is not None:
        clauses.append(F.col(spec.department_col) == F.lit(spec.department_id))
    if spec.region_id is not None:
        clauses.append(F.col(spec.region_col) == F.lit(spec.region_id))
    if spec.owner_type not in (None, "all"):
        clauses.append(F.col(spec.owner_col) == F.lit(spec.owner_type))
    if spec.shippable is not None:
        clauses.append(F.col(spec.shippable_col) == F.lit(spec.shippable))
    if not clauses:
        return None
    pred = clauses[0]
    for c in clauses[1:]:
        pred = pred & c
    return pred


def compile_search(df: DataFrame, spec: SearchSpec) -> DataFrame:
    """Full compile: filter → sort → paginate. Sort always ends with
    the id column so pages are a total order (deterministic)."""
    pred = compile_predicate(spec)
    out = df.filter(pred) if pred is not None else df
    order: list[Column] = []
    if spec.sort_by:
        # 'time'/'price' map per the reference Sort enum; any other
        # value is taken as a column name on the bound table.
        c = F.col(_SORTS.get(spec.sort_by, spec.sort_by))
        order.append(c.asc() if spec.sort_asc else c.desc())
    order.append(F.col(spec.id_col).asc())
    return sort_page(out, order, limit=spec.limit, page=spec.page)


def parse_search_url(url: str) -> SearchSpec:
    """Q11: parse a search URL's query string into a SearchSpec —
    re-expression of ``build_search_payload_with_url``
    (``dags/lbc/lbc/utils.py:6-152``): ``text``, ``category``,
    ``<enum>=a,b``, ``<range>=lo-hi`` (open halves ``lo-``/``-hi``),
    ``owner_type``, ``shippable``, ``sort_by``/``sort_order``,
    ``page``/``limit``."""
    spec = SearchSpec()
    known_scalar = {
        "text": lambda v: setattr(spec, "text", v),
        "category": lambda v: setattr(spec, "category", v),
        "owner_type": lambda v: setattr(spec, "owner_type", v),
        "shippable": lambda v: setattr(spec, "shippable", v.lower() == "true"),
        "sort_by": lambda v: setattr(spec, "sort_by", v),
        "sort_order": lambda v: setattr(spec, "sort_asc", v == "asc"),
        "page": lambda v: setattr(spec, "page", int(v)),
        "limit": lambda v: setattr(spec, "limit", int(v)),
        "search_in_title_only": lambda v: setattr(
            spec, "search_in_title_only", v.lower() == "true"
        ),
    }
    for key, value in parse_qsl(urlsplit(url).query):
        if key in known_scalar:
            known_scalar[key](value)
        elif "-" in value and _is_range(value):
            lo, _, hi = value.partition("-")
            spec.ranges[key] = (
                float(lo) if lo else None,
                float(hi) if hi else None,
            )
        else:
            spec.enums.setdefault(key, []).extend(
                v for v in value.split(",") if v
            )
    return spec


def _is_range(value: str) -> bool:
    lo, _, hi = value.partition("-")
    def _num(s: str) -> bool:
        try:
            float(s)
            return True
        except ValueError:
            return False
    return (not lo or _num(lo)) and (not hi or _num(hi)) and (lo != "" or hi != "")
