"""Deterministic, cross-engine-stable hashing helpers.

Everything here is built on ``md5`` hex strings because MD5 is the one
hash with identical output in PySpark (``F.md5``) and DuckDB
(``md5``) — which lets every hashing-based operator (exact dedup,
MinHash-LSH, SimHash, fingerprinting) be checked against an ANSI-SQL
oracle bit-for-bit. Lexicographic MIN over fixed-width hex strings is
a valid min-hash (a uniform order induced by a uniform hash).

All expressions are JVM-side Column algebra — no Python UDFs — so they
stay inside whole-stage codegen at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for fingerprinting/dedup: lowercase, strip
    non-alphanumerics to spaces, collapse runs, trim. Mirrors the SQL
    ``trim(regexp_replace(regexp_replace(lower(x),'[^a-z0-9]+',' '),' +',' '))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    stripped = F.regexp_replace(lowered, "[^a-z0-9]+", " ")
    return F.trim(F.regexp_replace(stripped, " +", " "))


def stable_fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def md5_min_shingle(shingle_col: Column, seed: int) -> Column:
    """One MinHash component: md5 of a seed-prefixed shingle. MIN of
    this over a document's shingles = signature element ``seed``."""
    return F.md5(F.concat(F.lit(f"{seed}|"), shingle_col))


def hex_digit_value(hex_char: Column) -> Column:
    """Hex digit char → integer 0..15.

    Spark side uses ``conv(ch, 16, 10)``; the DuckDB oracle uses
    ``instr('0123456789abcdef', ch) - 1`` — same value, different
    spelling (DuckDB lacks ``conv``, PySpark's ``instr`` wants a
    literal needle).
    """
    return F.conv(hex_char, 16, 10).cast("int")
