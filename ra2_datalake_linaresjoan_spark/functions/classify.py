"""Keyword classifiers as ordered ``when`` chains (SURVEY.md §2.8 F7/F8).

Behavior mirrors reference ``src/utils/transformer_data.py:393-455``:
first-match-wins over an ordered keyword table; null question → null;
no match → the documented default label. Implemented as cascaded Column
``when`` expressions so classification runs JVM-side at full scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Ordered (label, substring-keywords) table — order is semantic
#: (DOTA before Valorant before CS:GO…, reference transformer_data.py:405-419).
GAME_KEYWORDS: list[tuple[str, list[str]]] = [
    ("DOTA", ["dota", "dota 2", "dota2", "the international", "ti8", "ti9", "ti10", "ti11", "ti12", "ti13"]),
    ("Valorant", ["valorant", "vct ", "valorant champions"]),
    ("CS:GO", ["cs:go", "csgo", "counter-strike", "blast premier", "blast bounty", "esl pro", "iem ", "faceit", "pgl major"]),
    ("League of Legends", ["league of legends", "leagueoflegends", "lck ", "lcs ", "lec ", "worlds 20", "msi 20"]),
    ("Fortnite", ["fortnite"]),
    ("Overwatch", ["overwatch", "owcs"]),
    ("Apex Legends", ["apex legends", "apex legends global"]),
    ("Call of Duty", ["call of duty league", "cod league", "cdl "]),
    ("Hearthstone", ["hearthstone", "hct "]),
    ("StarCraft", ["starcraft", "starcraft 2", "sc2"]),
    ("Rocket League", ["rocket league", "rlcs"]),
    ("Rainbow Six", ["rainbow six", "r6 siege", "six invitational"]),
    ("Esports General", ["esports", "esport"]),
]

DEFAULT_GAME = "Esports General"


def _fold(question: Column) -> Column:
    """ASCII fold for classifier matching: the keyword tables above are
    all-ASCII, so the 26-letter translate fold suffices — and unlike a
    full ``F.lower()`` it cannot fold non-ASCII INTO ASCII (U+212A
    Kelvin → 'k') and complete a keyword the raw text does not contain
    (round-12 fold contract, finished at these last two call sites in
    round 13).  Bit-identical to ``lower()`` on ASCII text."""
    from ra2_datalake_linaresjoan_spark.operators.filters import _ascii_fold

    return _ascii_fold(question)


def extract_gaming_type(question: Column) -> Column:
    """Ordered keyword → game label classifier (F7)."""
    q = _fold(question)
    expr: Column = F.lit(DEFAULT_GAME)
    # build the when-chain from the END of the priority table backwards so
    # the first (highest-priority) rule is the outermost condition
    for label, keywords in reversed(GAME_KEYWORDS):
        cond = None
        for kw in keywords:
            c = q.contains(kw)
            cond = c if cond is None else (cond | c)
        expr = F.when(cond, F.lit(label)).otherwise(expr)
    return F.when(q.isNull() | (q == ""), F.lit(None).cast("string")).otherwise(expr)


def extract_bet_type(question: Column) -> Column:
    """Rule-chain bet-type classifier (F8) — order-sensitive, mirrors
    transformer_data.py:439-455."""
    q = _fold(question)
    expr = (
        F.when(q.contains("will win"), F.lit("Match Winner"))
        .when(
            q.contains("spread") | q.contains("by more than") | q.contains("by less than"),
            F.lit("Spread"),
        )
        .when(q.contains("over") & q.contains("under"), F.lit("Over/Under"))
        .when(
            q.contains("total") & (q.contains("point") | q.contains("kill")),
            F.lit("Over/Under"),
        )
        .when(q.contains("first") & q.contains("win"), F.lit("First Blood"))
        .when(q.contains("mvp") | q.contains("best player"), F.lit("MVP/Best Player"))
        .when(q.contains("map") | q.contains("round"), F.lit("Round/Map Winner"))
        .otherwise(F.lit("Prop Bet"))
    )
    return F.when(q.isNull() | (q == ""), F.lit(None).cast("string")).otherwise(expr)
