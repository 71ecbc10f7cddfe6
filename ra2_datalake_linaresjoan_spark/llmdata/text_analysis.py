"""Text-analysis operators for LLM data pipelines.

All pure Column expressions (JVM-side, codegen-friendly): token counting,
quality scoring, heuristic language ID, and document fingerprinting. At
100 TB these run at scan speed with zero Python and zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Regex of a "BPE-ish" token: word runs OR single non-word-non-space chars.
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

#: Tiny per-language marker-word lists for the n-gram/stopword heuristic.
#: Deliberately small and deterministic — the contract is "same answer
#: everywhere", not linguistic accuracy; swap in fastText offline for that.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "et", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


_ASCII_LO = "abcdefghijklmnopqrstuvwxyz"
_ASCII_UP = _ASCII_LO.upper()


def ascii_words(col: Column | str) -> Column:
    """Case-insensitive ASCII word tokens: ``translate`` the 26 ASCII
    uppercase letters to lowercase (a pure char map — NO unicode case
    logic), then split on ``[^a-z]+``.

    Why not ``lower()`` first (round-11 unicode-fuzz find): Java's
    ``lower()`` applies full/special case mappings — lower('İ') is
    'i' + U+0307 (the combining dot then SPLITS a token that DuckDB's
    utf8proc keeps whole), upper('ß') = 'SS' vs 'ẞ', Greek sigma is
    context-sensitive — so lower-then-tokenize yields DIFFERENT token
    sets per engine the moment text leaves ASCII.  ``translate`` maps
    chars 1:1 identically in every engine, non-ASCII letters fall
    through untouched and become separators, and the whole tokenizer
    stays ONE string pass + one split (the first formulation — a
    per-token ``transform(…, lower)`` — measured 2× on the corpus
    tokenizers).  On ASCII corpora the result is bit-identical to the
    old lower-then-split.  Pair with ``ascii_words_sql``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.translate(c, _ASCII_UP, _ASCII_LO), "[^a-z]+")


def ascii_words_sql(expr: str) -> str:
    """The oracle-side expression matching ``ascii_words``."""
    return (
        f"regexp_split_to_array(translate({expr}, '{_ASCII_UP}',"
        f" '{_ASCII_LO}'), '[^a-z]+')"
    )


def ascii_lower(col: Column | str) -> Column:
    """ASCII-only case fold: ``translate`` the 26 ASCII uppercase letters
    to lowercase, leaving every other character (incl. non-ASCII letters)
    untouched.

    The whitespace-tokenizer sibling of ``ascii_words`` (round-12
    migration): pipelines that split on ``\\s+`` — shingles, stopword /
    marker matching, fingerprint normalization — only need case folding
    so their all-ASCII vocabulary matches; Java's full-case ``lower()``
    rewrites non-ASCII characters DIFFERENTLY from DuckDB's utf8proc
    (lower('İ') = 'i'+U+0307 vs 'i̇' normalization differences, Greek
    final sigma context rules), so any downstream regex over the folded
    text can diverge per engine.  ``translate`` is a pure 1:1 char map —
    identical everywhere — and bit-identical to ``lower()`` on ASCII
    text.  Pair with ``ascii_lower_sql``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c.cast("string"), _ASCII_UP, _ASCII_LO)


def ascii_lower_sql(expr: str) -> str:
    """The oracle-side expression matching ``ascii_lower``."""
    return f"translate({expr}, '{_ASCII_UP}', '{_ASCII_LO}')"


def whitespace_token_count(col: Column) -> Column:
    """Whitespace-delimited token count; empty/null-safe → 0."""
    t = F.trim(col.cast("string"))
    return F.when(
        t.isNull() | (t == ""), F.lit(0)
    ).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count via the BPE-ish regex (word runs plus
    individual punctuation marks) — a cheap, deterministic proxy for
    tokenizer-length used in data-quality filtering. Null-safe → 0 like
    its whitespace sibling (under non-ANSI configs ``size(null)`` is -1,
    which silently drags averages negative)."""
    return F.when(col.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(col.cast("string"), F.lit(BPE_TOKEN_RE), 0))
    )


def punct_ratio(col: Column) -> Column:
    r"""Fraction of non-space characters that are punctuation/symbols.

    The letter/digit whitelist is UNICODE (``\p{L}\p{N}``, identical
    semantics in Java regex and RE2): an ASCII-only class counted every
    accented letter as punctuation, depressing quality_score by up to
    ~0.3 for exactly the es/fr/de documents ``language_id`` supports."""
    s = col.cast("string")
    nospace = F.regexp_replace(s, r"\s", "")
    punct = F.regexp_replace(nospace, r"[\p{L}\p{N}_]", "")
    return F.when(F.length(nospace) == 0, F.lit(0.0)).otherwise(
        F.length(punct).cast("double") / F.length(nospace)
    )


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = ("the", "a", "of", "and", "is")) -> Column:
    """Fraction of whitespace tokens that are in the stopword list.

    Case folding is ``ascii_lower`` (round-12): the stopword vocabulary
    is all-ASCII, so a unicode-aware lower() buys nothing and costs
    engine-divergent folds of non-ASCII text."""
    words = F.split(F.trim(ascii_lower(col)), r"\s+")
    n = F.size(words)
    hits = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def quality_score(col: Column) -> Column:
    """Composite 0-1 document quality score from length / punctuation /
    stopword signals — the standard pre-training heuristic filter shape.

    score = 0.4·len_score + 0.3·(1 − punct_ratio) + 0.3·stop_score where
    len_score saturates at 200 tokens and stop_score rewards a natural
    stopword rate (~2-60%).

    Round-13 (guide §1.2 per-task work): the original composed
    ``whitespace_token_count`` + ``punct_ratio`` + ``stopword_ratio``
    verbatim, which split the text TWICE (raw trim for the count,
    folded trim for the stopwords) and allocated TWO regexp_replace'd
    copies of every document for the punctuation ratio.  This inlined
    form tokenizes ONCE (the fold is a 1:1 char map that never touches
    whitespace, so raw and folded token counts are provably equal) and
    computes the punctuation ratio with ``regexp_count`` arithmetic —
    length(regexp_replace(s, p, '')) ≡ length(s) − regexp_count(s, p)
    for any single-char class p — allocating no intermediate strings.
    Value-identical to the composed form for every input incl. NULL
    (NULL text: n_tok CASE → 0, p stays NULL, sw stays NULL exactly as
    before).
    """
    s = col.cast("string")
    folded = F.trim(ascii_lower(s))
    words = F.split(folded, r"\s+")
    n_tok = (
        F.when(folded.isNull() | (folded == ""), F.lit(0))
        .otherwise(F.size(words))
        .cast("double")
    )
    len_score = F.least(n_tok / F.lit(200.0), F.lit(1.0))
    n_nospace = F.length(s) - F.regexp_count(s, F.lit(r"\s"))
    n_punct = n_nospace - F.regexp_count(s, F.lit(r"[\p{L}\p{N}_]"))
    p = F.when(n_nospace == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / n_nospace
    )
    n_words = F.size(words)
    hits = F.size(F.filter(words, lambda w: w.isin("the", "a", "of", "and", "is")))
    sw = F.when(n_words == 0, F.lit(0.0)).otherwise(hits.cast("double") / n_words)
    stop_score = F.when((sw >= 0.02) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(0.4 * len_score + 0.3 * (1.0 - p) + 0.3 * stop_score, 6)


def language_id(col: Column) -> Column:
    """Heuristic language ID: count marker-word hits per language, argmax
    with deterministic tie order (en > es > fr > de), 'und' when nothing
    matches. Pure expressions → runs at scan speed.  Marker matching
    folds case via ``ascii_lower`` (all-ASCII marker lists — see
    ``stopword_ratio``)."""
    words = F.split(F.trim(ascii_lower(col)), r"\s+")
    scores = {
        lang: F.size(F.filter(words, lambda w: w.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed() so earlier langs win ties via outermost when
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def doc_fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint: md5 of the casefolded,
    whitespace-collapsed, punctuation-stripped text. Identical content →
    identical fingerprint across engines (md5 is engine-agnostic; the
    case fold is ``ascii_lower`` so the pre-strip text is byte-identical
    per engine — with full ``lower()``, Java and utf8proc disagree on
    non-ASCII folds BEFORE the [^a-z0-9\\s] strip removes them, and the
    strip can then expose different edge whitespace)."""
    norm = F.regexp_replace(F.trim(ascii_lower(col)), r"[^a-z0-9\s]", "")
    norm = F.regexp_replace(norm, r"\s+", " ")
    # final trim: punctuation stripping can CREATE edge spaces ('hello !'
    # -> 'hello ') that the initial trim ran too early to see — without
    # it, content differing only in space-adjacent punctuation
    # fingerprints differently and exact_dedup misses the duplicate
    return F.md5(F.trim(norm))


#: PII patterns kept deliberately simple and dialect-portable (identical
#: semantics under Java regex and RE2) — production swaps in a richer set.
#: case-insensitive via explicit ranges (portable to RE2): a lowercase-
#: only email pattern left 'JOHN.DOE@EXAMPLE.COM' unredacted — a PII leak
EMAIL_RE = r"[A-Za-z0-9.]+@[A-Za-z]+\.[A-Za-z]+"
PHONE_RE = r"\+1-555-[0-9]{4}"


def pii_counts(col: Column) -> tuple[Column, Column]:
    """(email_matches, phone_matches) per document — scan-speed Column
    expressions; the redaction decision stays with the caller."""
    c = col.cast("string")
    return (
        F.regexp_count(c, F.lit(EMAIL_RE)),
        F.regexp_count(c, F.lit(PHONE_RE)),
    )


def redact_pii(col: Column) -> Column:
    """Replace email/phone matches with typed placeholders. Idempotent:
    the placeholders themselves match neither pattern."""
    c = col.cast("string")
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
