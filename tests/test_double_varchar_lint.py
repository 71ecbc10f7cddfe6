"""Registry-wide lint: no raw double→string cast may enter a query plan.

Round-12's semantics probe (tools/semantics_probe.py, SCALE.md) found the
third latent cross-engine divergence class: double→VARCHAR FORMATTING.
Spark renders scientific notation at |x| ≥ 1e7 and < 1e-3 ('1.0E7') and
spells 'NaN'/'Infinity'; DuckDB renders plain digits ('10000000.0') and
'nan'/'inf'.  No current query is exposed — money digests go through the
exact-cents INTEGER path (operators/filters.exact_cents), and the one
float-rendering site operates on a domain where both engines agree — but
the class stays unreachable only as long as nobody adds a new cast.  This
lint walks the ANALYZED plan of every registered query and fails on any
Cast(double/float → string) outside the explicit allowlist, so a new
string-rendered double must consciously register here (and justify its
bounded domain) instead of silently joining the registry.

The walk uses the analyzed (resolved) logical plan so every child
expression carries its type; traversal goes through py4j on the Catalyst
tree — subqueries included via plan.subqueries; no job is executed.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"

#: query name -> max allowed double/float→string casts, each justified.
#: The lint's target is RENDERED doubles reaching cross-engine-compared
#: output; a cast is allowable when (a) the string never leaves the
#: Spark plan, (b) it only feeds cardinalities (any injective rendering
#: preserves counts), or (c) the query's population is explicitly
#: bounded to the formatting-agreeing domain [1e-3, 1e7) where both
#: engines render identical plain decimals (semantics-probe class 3).
ALLOWED: dict[str, int] = {
    # internal tie-break fingerprint inside operators/asof.py: the
    # stringified value feeds xxhash64 to order equal-timestamp right
    # rows deterministically; it never appears in output and the
    # oracle (native ASOF JOIN) has no counterpart expression.
    "asof_join": 1,
    # l_quantity stringified only to count distinct values per column
    # (dictionary-encoding advice) — injective rendering on both
    # engines, so every cardinality/count is formatting-independent.
    "encoding_advisor": 1,
    # the query's SUBJECT is the string→array parser round-trip; its
    # synthesized inputs are population-bounded (printable-ASCII fence
    # + parse-back through try_cast, where the rendered FORM cancels:
    # cast(round(x,2)) parses back to round(x,2) in any notation).
    "jsonish_arrays_parity": 4,
    # renders doubles to numeric strings BY DESIGN (F2 parity) with the
    # population bounded to |x| < 1e7 on both sides (round-13).
    "normalize_numeric_parity": 2,
}


def _iter_exprs(jexpr):
    yield jexpr
    ch = jexpr.children()
    for i in range(ch.size()):
        yield from _iter_exprs(ch.apply(i))


def _iter_plans(jplan):
    yield jplan
    ch = jplan.children()
    for i in range(ch.size()):
        yield from _iter_plans(ch.apply(i))
    inner = jplan.innerChildren()
    for i in range(inner.size()):
        yield from _iter_plans(inner.apply(i))


def _double_to_string_casts(df) -> int:
    analyzed = df._jdf.queryExecution().analyzed()
    n = 0
    for plan in _iter_plans(analyzed):
        exprs = plan.expressions()
        for i in range(exprs.size()):
            for e in _iter_exprs(exprs.apply(i)):
                if e.getClass().getSimpleName() != "Cast":
                    continue
                if e.dataType().typeName() != "string":
                    continue
                child_t = e.child().dataType().typeName()
                if child_t in ("double", "float"):
                    n += 1
    return n


@pytest.mark.parametrize("chunk", range(10))
def test_no_raw_double_to_varchar_cast(spark, chunk):
    import __spark_entry__ as entry

    qs = entry.queries()
    names = sorted(qs)
    offenders: list[str] = []
    for name in names[chunk::10]:
        try:
            df = qs[name](spark, SF_SMOKE)
        except Exception:
            # construction failures belong to the oracle sweep, not here
            continue
        n = _double_to_string_casts(df)
        if n > ALLOWED.get(name, 0):
            offenders.append(f"{name}: {n} double->string cast(s)")
    assert not offenders, (
        "raw double->string casts reached the plan (Spark renders "
        "scientific/'NaN', DuckDB plain/'nan' — route through the "
        "exact-cents integer path or justify a bounded domain in "
        "ALLOWED): %r" % offenders
    )
