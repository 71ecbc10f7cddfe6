"""JSON-ish parsing helpers (SURVEY.md §2.8 F9/F10/F20).

The reference's bronze layer stores nested API payloads as Python-literal
JSON strings (single quotes). Parsing behavior mirrors
``loader_NeonDB.py:287-304`` (tolerant list parse) and ``:408-429``
(tag structs → label ?? slug ?? id), with the documented contract
"best-effort parse → null on failure" (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _repair(col: Column) -> Column:
    """Python-literal JSON → JSON (single→double quotes, reference quirk)."""
    return F.regexp_replace(col.cast("string"), "'", '"')


def parse_json_ish(col: Column, schema: str) -> Column:
    """Parse a possibly-Python-literal JSON string with the given schema.

    ``from_json`` returns null on malformed input — the engine's documented
    parse-failure contract. Apostrophes inside values corrupt the repair
    (same as the reference's replace trick) and land in the null path.
    """
    return F.from_json(_repair(col), schema)


def parse_list_value(col: Column) -> Column:
    """Tolerant list parse (F9): '[...]' → array<string>, else empty array.

    Mirrors ``loader_NeonDB.py:287-304`` (_parse_list_value).
    """
    s = F.trim(col.cast("string"))
    parsed = F.when(s.startswith("["), F.from_json(_repair(s), "array<string>"))
    return F.coalesce(parsed, F.array().cast("array<string>"))


def parse_struct_labels(col: Column) -> Column:
    """Tag objects → labels (F10), PER ELEMENT like the reference
    (``loader_NeonDB.py:408-429`` _parse_tags_field iterates the parsed
    list): a dict element yields ``label ?? slug ?? id`` (trimmed) or is
    DROPPED when it has none of those keys; a string element is kept
    trimmed; blanks drop. Mixed dict/string lists therefore resolve
    per element, and an unknown-key object (``[{'name': 'x'}]``) yields
    ``[]`` — it must never leak its JSON text as a label (the previous
    whole-array fallback emitted the blob into dim_tag_gaming).
    """
    strings = parse_json_ish(col, "array<string>")

    def label_of(x: Column) -> Column:
        st = F.from_json(x, "struct<label:string,slug:string,id:string>")
        return F.when(
            F.trim(x).startswith("{"),
            F.trim(F.coalesce(st["label"], st["slug"], st["id"])),
        ).otherwise(F.trim(x))

    labels = F.transform(strings, label_of)
    return F.filter(labels, lambda e: e.isNotNull() & (e != ""))


def extract_ids(col: Column) -> Column:
    """Embedded entity structs → array of their ids (J10 pattern):
    "[{'id': 'E1', ...}]" → ['E1']  (loader_NeonDB.py:711-736)."""
    structs = parse_json_ish(col, "array<struct<id:string>>")
    return F.filter(
        F.transform(structs, lambda x: x["id"]), lambda x: x.isNotNull()
    )
