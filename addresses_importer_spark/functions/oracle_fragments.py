"""DuckDB SQL fragments mirroring the Spark expression builders.

Single source of truth for the correctness gate: the MinHash constants
come from the same ``DedupConfig.minhash_perms()`` the Spark side uses,
so the driver's Spark-vs-DuckDB comparison checks real bit-for-bit
parity of the blocking math, not just row counts.

Parity contract (verified in tests/test_hashing.py):
  Spark  conv(substring(md5(s),1,15),16,10)::long
  DuckDB ('0x' || substr(md5(s),1,15))::BIGINT
"""

from __future__ import annotations

from ..config import DedupConfig


def sql_md5_long(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def sql_normalize(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'))"


def sql_minhash_signature(hashes_expr: str, cfg: DedupConfig) -> str:
    """[min((a*x+b) % mod) for each perm] as a LIST(BIGINT)."""
    mod = cfg.minhash_mod
    mins = ", ".join(
        f"list_min(list_transform({hashes_expr}, x -> ({a}*x + {b}) % {mod}))"
        for (a, b) in cfg.minhash_perms()
    )
    return f"[{mins}]"


def sql_band_keys(sig_expr: str, cfg: DedupConfig, detector: str = "minhash") -> str:
    """list of struct(band, bucket_key) matching hashing.band_keys.

    DuckDB lists are 1-indexed; Spark's sig_col[i] is 0-indexed, hence
    the +1 offsets here.
    """
    entries = []
    for b in range(cfg.bands):
        vals = " || '_' || ".join(
            f"({sig_expr})[{b * cfg.rows + i + 1}]::VARCHAR" for i in range(cfg.rows)
        )
        key_str = f"'{detector}:{b}' || '_' || {vals}"
        entries.append(
            f"{{'band': {b}, 'bucket_key': {sql_md5_long('(' + key_str + ')')}}}"
        )
    return "[" + ", ".join(entries) + "]"


def sql_poly_codes(norm_expr: str) -> str:
    """DuckDB twin of hashing.poly_codes_sql: per-char code points.
    range(a, b) is end-exclusive; string[i] is 1-based char access."""
    return (
        f"list_transform(range(1, length({norm_expr}) + 1), "
        f"i -> ascii({norm_expr}[i]))"
    )


def sql_poly_hashes_from_codes(codes_expr: str, width: int,
                               base: int, mod: int) -> str:
    """DuckDB twin of hashing.poly_hashes_from_codes_sql. DuckDB's
    list_reduce has no initial-accumulator argument (it seeds from the
    first element), so a 0 is prepended — identical to Spark's
    aggregate(..., 0, ...) fold. List slices are 1-based inclusive.
    ``codes_expr`` is bound once to the lambda variable ``cs`` exactly
    like the Spark side (self-binding keeps the fold linear under any
    expression inlining; see hashing.poly_hashes_from_codes_sql).

    NOTE: DuckDB's list_distinct does NOT preserve element order while
    Spark's array_distinct does — the two sides agree as SETS. Only
    order-insensitive consumers (min/size/explode+agg) may use this
    fragment; never hash or compare the raw array positionally."""
    fold = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"cs[i : i + {width - 1}]), "
        f"(acc, c) -> (acc * {base} + c) % {mod})"
    )
    return (
        f"list_transform([{codes_expr}], cs -> "
        f"CASE WHEN len(cs) >= {width} THEN "
        f"list_distinct(list_transform("
        f"range(1, len(cs) - {width} + 2), i -> {fold})) "
        f"ELSE [] END)[1]"
    )


def sql_jaccard(a: str, b: str) -> str:
    inter = f"len(list_intersect({a}, {b}))"
    return (
        f"(CASE WHEN len({a}) + len({b}) - {inter} > 0 "
        f"THEN {inter}::DOUBLE / (len({a}) + len({b}) - {inter}) "
        f"ELSE 0.0 END)"
    )
