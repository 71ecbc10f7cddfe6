"""Paginated REST ingestion source (SURVEY §2.1 S1/S2).

The reference fetches pages on driver threads
(``extractor_polymarket.py:59-141``: 10-thread ThreadPoolExecutor over
offset batches). The engine distributes the same pagination across
executors: ``spark.range(n_pages)`` → ``mapInPandas`` where each task
fetches its offset range — so ingest parallelism scales with the cluster,
not a driver thread pool, and the result is immediately a DataFrame.

``fetch_page`` is injectable: tests supply a synthetic fetcher; production
supplies an HTTP one (requests/urllib — tolerant of the three response
shapes the API uses: bare list, {"data": [...]}, {endpoint: [...]}).
Termination: the reference stops when a batch under-fills
(:134, which silently truncates on transient failures — SURVEY §2.11);
the engine instead probes the total count once (or accepts an explicit
page bound) so no silent tail loss.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

#: fetch_page(endpoint, offset, limit) -> list of record dicts
FetchFn = Callable[[str, int, int], list[dict]]


def normalize_response(payload, endpoint: str) -> list[dict]:
    """Tolerate the API's three response shapes
    (extractor_polymarket.py:72-85)."""
    if isinstance(payload, list):
        return payload
    if isinstance(payload, dict):
        if isinstance(payload.get("data"), list):
            return payload["data"]
        if isinstance(payload.get(endpoint), list):
            return payload[endpoint]
    return []


def retrying(
    fetch: FetchFn,
    retries: int = 3,
    backoff_sec: float = 0.5,
    on_exhausted: str = "raise",
) -> FetchFn:
    """Wrap any fetcher with bounded retry + exponential backoff.

    The reference silently truncates the table on a transient page failure
    (``extractor_polymarket.py:134``, SURVEY §2.11-6) — this engine makes
    page loss observable instead: after ``retries`` attempts the wrapper
    either re-raises (``on_exhausted="raise"``, default — the job fails
    loudly) or emits a poison record (``on_exhausted="poison"``: a single
    ``{"_error", "_endpoint", "_offset"}`` row rides through the normal
    pipeline so downstream can quarantine and count losses). A silently
    shorter table is never an outcome.
    """
    import time

    if on_exhausted not in ("raise", "poison"):
        raise ValueError(f"on_exhausted must be 'raise' or 'poison': {on_exhausted!r}")
    if retries < 1:
        # retries=0 would skip the loop entirely and raise/poison as if a
        # fetch failed without ever attempting one
        raise ValueError(f"retries must be >= 1, got {retries}")

    def fetch_with_retry(endpoint: str, offset: int, limit: int) -> list[dict]:
        last: Exception | None = None
        for attempt in range(retries):
            try:
                return fetch(endpoint, offset, limit)
            except Exception as exc:  # noqa: BLE001 — transport errors are opaque
                last = exc
                if attempt < retries - 1:
                    time.sleep(backoff_sec * (2**attempt))
        if on_exhausted == "poison":
            return [{"_error": repr(last), "_endpoint": endpoint, "_offset": offset}]
        raise RuntimeError(
            f"page fetch failed after {retries} attempts: {endpoint} offset={offset}"
        ) from last

    return fetch_with_retry


def http_fetcher(
    base_url: str,
    timeout: int = 30,
    retries: int = 3,
    backoff_sec: float = 0.5,
    on_exhausted: str = "raise",
) -> FetchFn:
    """Production fetcher over urllib (no extra deps), with bounded retry —
    never swallows a failed page into an empty list."""
    from urllib.request import urlopen

    def fetch(endpoint: str, offset: int, limit: int) -> list[dict]:
        url = f"{base_url}/{endpoint}?limit={limit}&offset={offset}"
        with urlopen(url, timeout=timeout) as resp:
            return normalize_response(json.loads(resp.read()), endpoint)

    return retrying(fetch, retries=retries, backoff_sec=backoff_sec, on_exhausted=on_exhausted)


def extract_endpoint(
    spark: SparkSession,
    endpoint: str,
    fetch_page: FetchFn,
    total_pages: int,
    page_size: int = 500,
) -> DataFrame:
    """Distributed paginated extraction: one Spark task per page range.

    Records come back as JSON strings (one column) so arbitrary/evolving
    API schemas survive the transport; callers apply ``from_json`` with
    their schema contract (bronze is schema-on-read, SURVEY §1.3).
    """

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[str] = []
            for page in pdf["id"]:
                for rec in fetch_page(endpoint, int(page) * page_size, page_size):
                    rows.append(json.dumps(rec, default=str))
            yield pd.DataFrame({"raw": rows})

    pages = spark.range(total_pages)
    return pages.mapInPandas(fetch_partition, schema="raw string")


def bronze_ingest(
    spark: SparkSession,
    endpoint: str,
    fetch_page: FetchFn,
    total_pages: int,
    schema: str,
    page_size: int = 500,
) -> DataFrame:
    """Full bronze recipe: distributed fetch → from_json with the entity
    contract → one row per record with typed columns, PLUS pass-through
    ``_error``/``_offset`` columns (null on healthy rows).

    Poison records from ``retrying(on_exhausted="poison")`` carry only
    ``{"_error", "_endpoint", "_offset"}`` — under the entity schema alone
    they would parse to an all-NULL row, indistinguishable from a malformed
    record, which would silently defeat the loss-observability contract.
    Parsing the raw column a second time with the poison schema keeps the
    failure visible on the typed surface: quarantine with
    ``df.filter(col("_error").isNotNull())``, count losses per offset, and
    drop the two columns once the page range is re-fetched."""
    from pyspark.sql import functions as F

    raw = extract_endpoint(spark, endpoint, fetch_page, total_pages, page_size)
    poison = F.from_json("raw", "_error string, _offset long").alias("p")
    return raw.select(F.from_json("raw", schema).alias("r"), poison).select(
        "r.*", "p._error", "p._offset"
    )
