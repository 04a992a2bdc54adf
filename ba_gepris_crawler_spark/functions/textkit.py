"""Shared text-tokenization SQL fragments.

ONE definition of the whitespace tokenizer (and the n-gram shingler built
on it) shared by the dedup operators (operators/dedup.py) and the text-
analysis operators (operators/text_analysis.py): the two copies used to
live in both files, and a drift in either would silently break the
"semantics are identical" contract with the DuckDB oracle twins in
plans/queries/ (which replay the same tokenization with list_filter/
string_split_regex).
"""

from __future__ import annotations

# whitespace tokens, empties dropped — format with the text column name
TOKENIZE = "filter(split(trim({col}), '\\\\s+'), t -> t != '')"


def shingle_sql(n: int, toks: str = "toks") -> str:
    """n-token shingle array over a token-array column, SAFE FOR SHORT
    DOCS: Spark's sequence(1, 0) DESCENDS to [1, 0] (it is not empty like
    DuckDB's generate_series), so an unguarded sequence over a doc with
    fewer than n tokens evaluates toks[n-1] out of bounds — a hard
    INVALID_ARRAY_INDEX under ANSI mode (the Spark 4 default), or bogus
    partial shingles with ANSI off. Sub-n-token docs yield an empty array,
    matching the DuckDB twin exactly."""
    parts = ", ".join(f"{toks}[i + {j} - 1]" for j in range(n))
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), i -> concat_ws(' ', {parts})) "
        f"ELSE cast(array() as array<string>) END"
    )
