"""Spark 4 Python Data Source for paginated REST ingestion (SURVEY §2.1
S1/S2 as a first-class ``spark.read.format(...)`` source).

The reference fetches pages on driver threads
(``extractor_polymarket.py:93-141``); ``sources/rest.py`` already
distributes that across executors via ``mapInPandas``. This module goes one
step further and registers the ingest as a proper Spark data source
(``pyspark.sql.datasource``, new in Spark 4), which buys:

- one executor task per page partition, planned by Spark (not hand-rolled);
- the same source usable from SQL (``spark.read.format("rest_paginated")``)
  and, via ``simpleStreamReader``, from Structured Streaming
  (``spark.readStream.format("rest_paginated")``) with exactly-once offset
  tracking per page — the micro-batch boundary is the page number, so a
  restart resumes from the last committed page instead of re-pulling the
  world.

Options (all strings, per the DataSource API):
- ``endpoint``  — API entity name (markets/events/series/tags).
- ``mode``      — ``synthetic`` (deterministic fake pages, used in tests and
  offline dev) or ``http`` (GET ``{base_url}/{endpoint}?limit&offset``).
- ``base_url``  — required for ``mode=http``.
- ``total_pages`` / ``page_size`` — pagination bounds (no silent-truncation
  stop condition; SURVEY §2.11 flags the reference's early-stop bug).
- ``rows_per_page`` — synthetic mode row count.

Rows come back as one ``raw`` JSON-string column (bronze is schema-on-read,
SURVEY §1.3); callers apply ``from_json`` with their entity contract.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _synthetic_page(endpoint: str, offset: int, limit: int, rows_per_page: int) -> list[dict]:
    """Deterministic fake page: stable ids/fields derived from the offset —
    same contract shape as the real API (id + a few typed fields)."""
    base = offset
    return [
        {
            "id": f"{endpoint}-{base + i}",
            "question": f"Will outcome {base + i} happen?",
            "volume": float((base + i) % 1000),
            "active": (base + i) % 2 == 0,
        }
        for i in range(min(limit, rows_per_page))
    ]


def _fetch(options: dict, offset: int) -> list[dict]:
    endpoint = options.get("endpoint", "markets")
    page_size = int(options.get("page_size", "500"))
    mode = options.get("mode", "synthetic")
    if mode == "synthetic":
        rows_per_page = int(options.get("rows_per_page", str(page_size)))
        return _synthetic_page(endpoint, offset, page_size, rows_per_page)
    from ra2_datalake_linaresjoan_spark.sources.rest import http_fetcher

    return http_fetcher(options["base_url"])(endpoint, offset, page_size)


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class RestBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)

    def partitions(self):
        return [
            _PagePartition(p)
            for p in range(int(self.options.get("total_pages", "1")))
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        page_size = int(self.options.get("page_size", "500"))
        for rec in _fetch(self.options, partition.page * page_size):
            yield (json.dumps(rec, default=str),)


class RestStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch = one page; the offset log stores the next page number,
    so restarts resume exactly where the last committed batch ended."""

    def __init__(self, options: dict):
        self.options = dict(options)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        page = int(start["page"])
        total = int(self.options.get("total_pages", "1"))
        if page >= total:  # drained: empty batch, offset unchanged
            return iter([]), start
        page_size = int(self.options.get("page_size", "500"))
        rows = [
            (json.dumps(rec, default=str),)
            for rec in _fetch(self.options, page * page_size)
        ]
        return iter(rows), {"page": page + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        page_size = int(self.options.get("page_size", "500"))
        out: list[tuple] = []
        for page in range(int(start["page"]), int(end["page"])):
            out.extend(
                (json.dumps(rec, default=str),)
                for rec in _fetch(self.options, page * page_size)
            )
        return iter(out)


class RestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_paginated"

    def schema(self) -> str:
        return "raw string"

    def reader(self, schema) -> RestBatchReader:
        return RestBatchReader(self.options)

    def simpleStreamReader(self, schema) -> RestStreamReader:
        return RestStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(RestDataSource)
