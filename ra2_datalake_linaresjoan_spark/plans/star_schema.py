"""Gold star-schema builder (reference ``loader_NeonDB.py:682-882``).

Builds the 6-dimension + 3-fact gaming star schema as DataFrames:

- dim_fecha            — loader_NeonDB.py:94-105, 266-285
- dim_videojuego       — seeded 13-game catalog, loader_NeonDB.py:109-138
- dim_serie_gaming     — loader_NeonDB.py:141-149, 379-406
- dim_evento_gaming    — loader_NeonDB.py:152-173, 309-377
- dim_tag_gaming       — loader_NeonDB.py:176-182, 431-455
- dim_mercado_gaming   — loader_NeonDB.py:185-203, 555-605
- fact_mercado_evento  — N:N bridge, loader_NeonDB.py:206-216, 457-514
- fact_evento_tag      — N:N bridge, loader_NeonDB.py:219-229, 516-551
- fact_metricas        — metrics fact, loader_NeonDB.py:232-248, 607-652

Scale posture: dims are small → surrogate keys via single-partition
row_number windows are fine; facts never see a global window — FK
resolution is broadcast joins, bridges are explode + semi-join, and the
metrics fact joins dim_fecha by date (broadcast). Known reference bug
(SURVEY §2.11): unknown games fell back to a nonexistent 'Other Gaming'
seed → NULL; the engine falls back to 'Esports General' as documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.functions.calendar import build_date_dim
from ra2_datalake_linaresjoan_spark.functions.json_utils import (
    extract_ids,
    parse_struct_labels,
)
from ra2_datalake_linaresjoan_spark.functions.normalize import clean_string
from ra2_datalake_linaresjoan_spark.operators.bridges import explode_bridge
from ra2_datalake_linaresjoan_spark.operators.joins import semi_filter

#: Seed game catalog (loader_NeonDB.py:118-132) + engine fallback row.
GAME_CATALOG: list[tuple[str, str, bool]] = [
    ("DOTA", "MOBA", True),
    ("Valorant", "FPS Táctico", True),
    ("CS:GO", "FPS Táctico", True),
    ("League of Legends", "MOBA", True),
    ("Fortnite", "Battle Royale", True),
    ("Overwatch", "Hero Shooter", True),
    ("Apex Legends", "Battle Royale", True),
    ("Call of Duty", "FPS", True),
    ("Rocket League", "Deportes", True),
    ("Hearthstone", "Cartas", True),
    ("StarCraft", "RTS", True),
    ("Rainbow Six", "FPS Táctico", True),
    ("Esports General", "Esports", True),
]


def _c(df: DataFrame, name: str, dtype: str = "string"):
    """Schema-tolerant column access: absent columns become typed nulls —
    the Spark analog of the reference's defensive ``r.get(col)`` pattern
    (loader_NeonDB.py passim; bronze schemas are whatever the API returned
    that day, SURVEY §1.3)."""
    return F.col(name) if name in df.columns else F.lit(None).cast(dtype)


def dim_videojuego(spark: SparkSession) -> DataFrame:
    rows = [
        (i + 1, name, genero, es)
        for i, (name, genero, es) in enumerate(GAME_CATALOG)
    ]
    return spark.createDataFrame(
        rows, "videojuego_id int, nombre_juego string, genero string, es_esports boolean"
    )


def dim_serie(series: DataFrame) -> DataFrame:
    return series.filter(F.col("id").isNotNull()).select(
        F.col("id").cast("string").alias("serie_id"),
        clean_string(_c(series, "slug"), 500).alias("serie_slug"),
        clean_string(_c(series, "title"), 2048).alias("titulo"),
        clean_string(_c(series, "description"), 5000).alias("descripcion"),
    )


def _serie_id_of_event(events: DataFrame) -> DataFrame:
    """seriesId wins over the first id inside the embedded series JSON
    (loader_NeonDB.py:327-343)."""
    from_json_id = extract_ids(F.col("series"))[0] if "series" in events.columns else F.lit(None)
    explicit = (
        F.col("seriesId").cast("string") if "seriesId" in events.columns else F.lit(None)
    )
    return events.withColumn("_serie_id", F.coalesce(explicit, from_json_id))


def dim_evento(events: DataFrame, dim_serie_df: DataFrame) -> DataFrame:
    """Event dim with serie FK nulled when the serie doesn't exist
    (loader_NeonDB.py:344-345) — left join instead of a driver-side set."""
    ev = _serie_id_of_event(events).filter(F.col("id").isNotNull())
    valid = dim_serie_df.select(F.col("serie_id").alias("_valid_sid")).distinct()
    ev = ev.join(
        F.broadcast(valid), ev["_serie_id"] == F.col("_valid_sid"), "left"
    )
    return ev.select(
        F.col("id").cast("string").alias("evento_id"),
        clean_string(_c(ev, "title"), 2048).alias("titulo"),
        clean_string(_c(ev, "category"), 200).alias("categoria"),
        clean_string(_c(ev, "subcategory"), 200).alias("subcategoria"),
        clean_string(_c(ev, "ticker"), 500).alias("ticker"),
        clean_string(_c(ev, "slug"), 500).alias("slug"),
        F.coalesce(_c(ev, "active", "boolean"), F.lit(False)).alias("es_activo"),
        F.coalesce(_c(ev, "closed", "boolean"), F.lit(False)).alias("es_cerrado"),
        F.coalesce(_c(ev, "featured", "boolean"), F.lit(False)).alias("es_destacado"),
        _c(ev, "creationDate", "timestamp").alias("fecha_creacion"),
        _c(ev, "startDate", "timestamp").alias("fecha_inicio"),
        _c(ev, "endDate", "timestamp").alias("fecha_fin"),
        F.coalesce(clean_string(_c(ev, "resolutionSource"), 500), F.lit("Sin fuente")).alias(
            "fuente_resolucion"
        ),
        F.when(F.col("_valid_sid").isNotNull(), F.col("_serie_id")).alias("serie_id"),
    )


def dim_tag(events: DataFrame) -> DataFrame:
    """Distinct tag labels from events' embedded tags (struct or string
    arrays), surrogate key by sorted order (loader_NeonDB.py:431-455:
    sorted insert + SERIAL). Key assignment goes through
    ``surrogate_key`` — a global window at dimension scale, an
    offset-partitioned assignment if the dim ever outgrows it."""
    from ra2_datalake_linaresjoan_spark.operators.surrogate import surrogate_key

    labels = (
        events.select(
            F.explode(parse_struct_labels(_c(events, "tags"))).alias("tag_nombre")
        )
        .where(F.trim("tag_nombre") != "")
        .select(F.trim("tag_nombre").alias("tag_nombre"))
        .distinct()
    )
    return surrogate_key(labels, ["tag_nombre"], key_col="tag_id")


def dim_mercado(markets: DataFrame, dim_videojuego_df: DataFrame) -> DataFrame:
    """Market dim with videojuego FK via broadcast lookup; unknown →
    'Esports General' (documented divergence from the reference's
    'Other Gaming' bug)."""
    vj = F.broadcast(
        dim_videojuego_df.select(
            F.col("nombre_juego").alias("_vj_name"), F.col("videojuego_id")
        )
    )
    m = markets.filter(F.col("id").isNotNull()).withColumn(
        "_game",
        F.coalesce(_c(markets, "gaming_type"), F.lit("Esports General")),
    )
    m = m.join(vj, m["_game"] == F.col("_vj_name"), "left")
    fallback = dim_videojuego_df.filter(
        F.col("nombre_juego") == "Esports General"
    ).select(F.col("videojuego_id").alias("_fallback_id"))
    m = m.crossJoin(F.broadcast(fallback))
    return m.select(
        F.col("id").cast("string").alias("mercado_id"),
        clean_string(_c(m, "question"), 2000).alias("pregunta"),
        clean_string(_c(m, "bet_type"), 100).alias("tipo_apuesta"),
        F.coalesce(F.col("videojuego_id"), F.col("_fallback_id")).alias("videojuego_id"),
        clean_string(_c(m, "slug"), 500).alias("slug"),
        F.coalesce(_c(m, "active", "boolean"), F.lit(False)).alias("esta_activo"),
        F.coalesce(_c(m, "closed", "boolean"), F.lit(False)).alias("esta_cerrado"),
        _c(m, "endDate", "timestamp").alias("fecha_fin"),
        F.substring(F.to_json(_c(m, "outcomes_list", "array<string>")), 1, 2000).alias("outcomes"),
        # clean_string (not raw substring, matching dim_serie/dim_evento):
        # '' normalizes to null so the 'Sin fuente' coalesce actually fires
        F.coalesce(clean_string(_c(m, "resolutionSource"), 500), F.lit("Sin fuente")).alias(
            "fuente_resolucion"
        ),
        _c(m, "createdAt", "timestamp").alias("creado_en"),
        _c(m, "updatedAt", "timestamp").alias("actualizado_en"),
    )


def fact_mercado_evento(markets: DataFrame, dim_evento_df: DataFrame, dim_mercado_df: DataFrame) -> DataFrame:
    """Market↔event bridge from markets' embedded events JSON, kept only
    when both FK sides exist (loader_NeonDB.py:457-514)."""
    pairs = explode_bridge(
        markets.select(
            F.col("id").cast("string").alias("mercado_id"),
            _c(markets, "events").alias("events"),
        ),
        "mercado_id",
        extract_ids(F.col("events")),
        "evento_id",
    )
    pairs = semi_filter(pairs, dim_mercado_df.select("mercado_id"), "mercado_id")
    return semi_filter(pairs, dim_evento_df.select("evento_id"), "evento_id")


def fact_evento_tag(events: DataFrame, dim_evento_df: DataFrame, dim_tag_df: DataFrame) -> DataFrame:
    """Event↔tag bridge: explode parsed tag labels, resolve tag_id via
    broadcast join (loader_NeonDB.py:516-551)."""
    pairs = (
        events.select(
            F.col("id").cast("string").alias("evento_id"),
            F.explode(parse_struct_labels(_c(events, "tags"))).alias("tag_nombre"),
        )
        .where(F.trim("tag_nombre") != "")
        .select("evento_id", F.trim("tag_nombre").alias("tag_nombre"))
        .distinct()
    )
    pairs = semi_filter(pairs, dim_evento_df.select("evento_id"), "evento_id")
    return pairs.join(F.broadcast(dim_tag_df), "tag_nombre").select("evento_id", "tag_id")


def fact_metricas(markets: DataFrame, dim_fecha_df: DataFrame) -> DataFrame:
    """Metrics fact: one row per market snapshot dated by updatedAt,
    fecha FK via broadcast date join (loader_NeonDB.py:607-652). At scale
    this table is partitioned by fecha (see write_gold).

    INTENTIONAL drop (reference parity): a market whose updatedAt is
    null/unparseable has no date FK and the reference's NOT NULL fecha_id
    insert skips it — the inner join reproduces that; the validator's
    row-count check surfaces the delta when it matters."""
    m = markets.filter(F.col("id").isNotNull()).withColumn(
        "_fecha", F.to_date(_c(markets, "updatedAt", "timestamp"))
    )
    fd = F.broadcast(dim_fecha_df.select("fecha_id", F.col("fecha").alias("_fecha")))
    return (
        m.join(fd, "_fecha")
        .select(
            F.col("id").cast("string").alias("mercado_id"),
            F.col("fecha_id"),
            _c(m, "volume", "double").alias("volumen_total"),
            _c(m, "liquidity", "double").alias("liquidez_total"),
            _c(m, "lastTradePrice", "double").alias("precio_ultimo"),
            _c(m, "bestBid", "double").alias("mejor_compra"),
            _c(m, "bestAsk", "double").alias("mejor_venta"),
            _c(m, "spread", "double").alias("spread"),
            _c(m, "openInterest", "double").alias("interes_abierto"),
        )
    )


def build_gold(
    spark: SparkSession,
    markets: DataFrame,
    events: DataFrame,
    series: DataFrame,
) -> dict[str, DataFrame]:
    """Assemble the full star schema from silver-cleaned, gaming-enriched
    inputs. Returns {table_name: DataFrame} in FK-dependency order
    (loader_NeonDB.py:853-865)."""
    d_vj = dim_videojuego(spark)
    d_serie = dim_serie(series)
    d_evento = dim_evento(events, d_serie)
    d_tag = dim_tag(events)
    d_mercado = dim_mercado(markets, d_vj)
    d_fecha = build_date_dim(markets, "updatedAt")
    return {
        "dim_fecha": d_fecha,
        "dim_videojuego": d_vj,
        "dim_serie_gaming": d_serie,
        "dim_evento_gaming": d_evento,
        "dim_tag_gaming": d_tag,
        "dim_mercado_gaming": d_mercado,
        "fact_mercado_evento_gaming": fact_mercado_evento(markets, d_evento, d_mercado),
        "fact_evento_tag_gaming": fact_evento_tag(events, d_evento, d_tag),
        "fact_metricas_gaming": fact_metricas(markets, d_fecha),
    }


def write_gold(gold: dict[str, DataFrame], base_path: str) -> None:
    """Persist the star schema as parquet (Delta when available): facts
    partitioned by their date FK for partition pruning at scale."""
    for name, df in gold.items():
        writer = df.write.mode("overwrite")
        if name == "fact_metricas_gaming":
            # an EMPTY partitioned write emits only _SUCCESS (no schema
            # footer anywhere) and the read-back fails with
            # UNABLE_TO_INFER_SCHEMA — write empty facts unpartitioned so
            # the schema survives (capped probe, stops at the first row)
            if df.limit(1).count() > 0:
                writer = writer.partitionBy("fecha_id")
        writer.parquet(f"{base_path}/{name}")
