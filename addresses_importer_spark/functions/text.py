"""Text normalization + tokenization as JVM-side Column expressions.

Shingle hashing lives in functions/hashing.py (polynomial rolling fold
over the normalized char codes — shingle strings are never
materialized; round-5 family swap).

The reference delegates lexical normalization (case folding, accents,
"av."/"avenue" abbreviation equivalence) to libpostal inside
``hash_address`` / ``is_duplicate`` (deduplicator/src/lib/dedupe.rs:61-86,
129-198; fixtures deduplicator/data/tests/with_dupes.sql:18-44). The
graft normalizes transcripts with built-in string functions so the whole
blocking path stays inside whole-stage codegen — no Python per row.

Every builder here has a DuckDB twin in ``oracle_fragments.py`` used by
the correctness gate; keep the semantics in lock-step.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def normalize_text(col: Column) -> Column:
    """lower → strip non-alphanumerics → collapse whitespace → trim.

    Graft analog of libpostal token normalization (dedupe.rs:142-175);
    identical to the oracle's
    ``trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ', 'g'))``.
    """
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def words(norm_col: Column) -> Column:
    """Whitespace tokenization of already-normalized text."""
    return F.split(norm_col, " ")


def token_count(col: Column) -> Column:
    """Whitespace token count on normalized text (0 for empty)."""
    norm = normalize_text(col)
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    )
