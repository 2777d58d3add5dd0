"""Text normalization + shingling as JVM-side Column expressions.

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


def char_shingles(norm_col: Column, width: int) -> Column:
    """Distinct character shingles of ``width`` over normalized text.

    Empty result for texts shorter than ``width`` — the reference drops
    records whose blocking-hash set is empty (deduplicator.rs:371-374).
    Guarded because ``sequence(1, n)`` runs *descending* for n < 1.
    """
    n = F.length(norm_col)
    shingles = F.transform(
        F.sequence(F.lit(1), n - width + 1),
        lambda i: F.substring(norm_col, i, width),
    )
    return F.when(n >= width, F.array_distinct(shingles)).otherwise(
        F.array().cast("array<string>")
    )


def words(norm_col: Column) -> Column:
    """Whitespace tokenization of already-normalized text."""
    return F.split(norm_col, " ")


def token_count(col: Column) -> Column:
    """Whitespace token count on normalized text (0 for empty)."""
    norm = normalize_text(col)
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    )
