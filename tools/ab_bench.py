#!/usr/bin/env python
"""Per-query A/B timing harness (round-7 discipline): times the named
queries exactly the way bench.py does (noop sink, min-of-N after a
warm-up) so a candidate shape can be measured against HEAD's number
without running the whole 60-query headline set.

Usage: python tools/ab_bench.py [-n RUNS] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ra2_datalake_linaresjoan_spark import queries as q
from ra2_datalake_linaresjoan_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ra2_ab_bench")
    registry = q.queries()

    # same warm-up as bench.py: JVM + parquet footers + Arrow workers
    registry["pricing_summary"](spark, sf_dir).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    out: dict[str, dict[str, float]] = {}
    for name in args.names:
        runs = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        out[name] = {
            "min": round(min(runs), 3),
            "mean": round(sum(runs) / len(runs), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
