"""Pipelines: silver cleaning recipes, gold star-schema builder, warehouse
validator (reference main.py / loader_NeonDB.py / validator_warehouse.py
re-expressed as lazy DataFrame plans)."""

from ra2_datalake_linaresjoan_spark.plans.pipelines import (
    clean_events,
    clean_markets,
    clean_series,
    gaming_market_filter,
    gaming_summary,
)
from ra2_datalake_linaresjoan_spark.plans.star_schema import build_gold
from ra2_datalake_linaresjoan_spark.plans.validator import validate_gold

__all__ = [
    "clean_events",
    "clean_markets",
    "clean_series",
    "gaming_market_filter",
    "gaming_summary",
    "build_gold",
    "validate_gold",
]
