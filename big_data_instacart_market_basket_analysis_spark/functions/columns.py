"""Shared Catalyst expression helpers (SURVEY.md §2h).

All pure column expressions — they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column) -> Column:
    """Ratio with null-on-zero-denominator (F3, SURVEY.md §2h).

    The reference's pandas ratios (F.py:72, 106, 151, 157, 159-160)
    produce inf/NaN on zero denominators; the agreed engine semantic
    (SURVEY.md §7 risk list) is SQL null, matched in oracle SQL via
    ``NULLIF``. Explicit ``nullif`` keeps the behavior identical even
    if the session flips to ANSI mode.
    """
    return num / F.nullif(den, F.lit(0))


def sorted_set(col: Column | str) -> Column:
    """Deterministic replacement for the reference's set-collect (A7).

    ``collect_set`` order is nondeterministic across partitionings
    (reference bug F.py:136); ``array_sort`` pins it so value hashes are
    stable at any cluster layout.
    """
    return F.array_sort(F.collect_set(col))


def space_joined_products(product_col: Column | str = "productID") -> Column:
    """A12/F7 (F.py:298-304): space-joined productID string per group.

    The reference accumulates dict-insertion order (nondeterministic in a
    distributed run); we sort the collected list first (SURVEY.md §5
    determinism rule 4) so output is reproducible and hash-stable.
    """
    return F.array_join(
        F.array_sort(F.collect_list(F.col(product_col).cast("long"))).cast(
            "array<string>"
        ),
        " ",
    )
