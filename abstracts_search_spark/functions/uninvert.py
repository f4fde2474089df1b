"""Positional un-invert / invert of an inverted-abstract map.

Reproduces the reference's abstract reassembly exactly (oa_jsonl.c:232-282 in
/root/reference): given ``map<word, array<position>>``, place each word at
each of its positions, close gaps silently, and join the surviving words in
position order with single spaces; duplicate words (same word at many
positions) are preserved. Pure Catalyst built-ins — no UDF (SURVEY.md §2.4 A2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uninvert_expr(map_col: Column | str) -> Column:
    """map<string, array<int>> -> reassembled document string."""
    m = F.col(map_col) if isinstance(map_col, str) else map_col
    pairs = F.flatten(
        F.transform(
            F.map_entries(m),
            lambda e: F.transform(
                e.getField("value"),
                lambda p: F.struct(p.alias("pos"), e.getField("key").alias("word")),
            ),
        )
    )
    ordered = F.array_sort(pairs)
    return F.concat_ws(" ", F.transform(ordered, lambda s: s.getField("word")))


def invert_expr(tokens_col: Column | str) -> Column:
    """array<string> tokens -> map<word, array<position>> (inverse of A2).

    Used for the round-trip property test (SURVEY.md §5.1): for any token
    array, ``uninvert(invert(tokens)) == concat_ws(' ', tokens)``.
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    # (word, pos) pairs -> group positions per word via map_from_entries over
    # aggregated struct pairs. Build with transform + array_sort for stable order.
    pairs = F.transform(
        toks,
        lambda w, i: F.struct(w.alias("word"), i.alias("pos")),
    )
    words = F.array_distinct(F.transform(pairs, lambda s: s.getField("word")))
    return F.map_from_arrays(
        words,
        F.transform(
            words,
            lambda w: F.transform(
                F.filter(pairs, lambda s: s.getField("word") == w),
                lambda s: s.getField("pos"),
            ),
        ),
    )
