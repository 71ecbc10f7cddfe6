"""Python UDTF surface (Spark 4 table functions, SURVEY §2.10 extension).

The engine's default for row expansion is JVM-side ``explode`` over array
expressions (see llmdata/dedup.py shingling — that is the hot path). A
Python UDTF is the escape hatch for *imperative* generation that has no
expression form (stateful tokenizers, external parsers); this module
provides the canonical example — character shingling with positions — and
registers it for SQL lateral use: ``SELECT s.* FROM docs, shingles(text, 5) s``.

Scale note: UDTFs run Python per input row (batched via Arrow). Use only
when the generation logic genuinely cannot be expressed with
sequence()/transform()/explode; the engine's production shingling is
expression-based for exactly this reason.
"""

from __future__ import annotations

from pyspark.sql.functions import col, lit, udtf

#: ASCII-only case fold for the Python-side shingler (round-12): CPython's
#: ``str.lower()`` is a THIRD unicode case-fold implementation (after Java
#: and utf8proc) — 'İ'.lower() yields 'i̇' (2 codepoints) shifting every
#: downstream shingle position.  The 26-letter translate map is identical
#: to the JVM/SQL ``ascii_lower`` contract (text_analysis.ascii_lower) and
#: bit-identical to .lower() on ASCII text.
_ASCII_FOLD = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


@udtf(returnType="pos int, shingle string")
class CharShingles:
    """Emit (position, k-char shingle) rows for one input string."""

    def eval(self, text: str, k: int):  # noqa: D102 — UDTF contract
        if text is None or k is None or k <= 0:
            return
        t = text.translate(_ASCII_FOLD)
        for i in range(max(len(t) - k + 1, 0)):
            yield i, t[i : i + k]


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (lateral table-function position)."""
    spark.udtf.register("char_shingles", CharShingles)


def shingle_table(df, text_col: str, k: int):
    """DataFrame-API lateral join: one row per input row × shingle.
    Outer column references into the left side use ``col(...).outer()``."""
    return df.lateralJoin(CharShingles(col(text_col).outer(), lit(k)))
