"""Reference-shaped dirty fixtures (FIXTURES.md A1/A2), generated with
seeded Spark-native expressions — unlike the reference's unseeded
``random`` generators (generate_traffic_data.py:3), these are reproducible.

Dirtiness taxonomy mirrored from /root/reference/python-service/scripts/
generate_traffic_data.py and generate_weather_data.py:
- duplicate rows and NULL keys (traffic :31-37, weather :51-57)
- 3 timestamp layouts + ~7% garbage (:17-24, :43-46)
- 50% NULL city, NULL-able categoricals (:49-54, :87-92)
- numeric outliers, negatives, NULLs (:57-102)
- a mixed-type string column (weather visibility_m, :134-142)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CITIES = ["London"]
AREAS = ["Camden", "Chelsea", "Islington", "Southwark", "Kensington"]
CONGESTION = ["Low", "Medium", "High"]
ROAD = ["Dry", "Wet", "Snowy", "Damaged"]
WEATHER = ["Clear", "Rain", "Fog", "Storm", "Snow"]


def _choice(options: list[str], u: F.Column) -> F.Column:
    """Deterministic choice from a uniform column."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.floor(u * len(options)) + 1).cast("int"))


def _dirty_timestamp(ts: F.Column, u: F.Column) -> F.Column:
    """Format into one of 3 layouts; ~7% garbage; ~2% NULL."""
    return (
        F.when(u < 0.05, F.lit("2099-00-00 99:99"))
        .when(u < 0.07, F.lit("Invalid"))
        .when(u < 0.09, F.lit(None))
        .when(u < 0.40, F.date_format(ts, "yyyy-MM-dd HH:mm"))
        .when(u < 0.70, F.date_format(ts, "dd/MM/yyyy hha"))
        .otherwise(F.date_format(ts, "yyyy-MM-dd'T'HH:mm'Z'"))
    )


def generate_traffic_raw(spark: SparkSession, n: int = 5000, seed: int = 42) -> DataFrame:
    base_ts = F.to_timestamp(F.lit("2025-01-01 00:00:00"))
    df = spark.range(n).select(
        F.col("id"),
        *[F.rand(seed + i).alias(f"u{i}") for i in range(10)],
    )
    ts = F.timestamp_add("MINUTE", (F.col("u0") * 60 * 24 * 180).cast("int"), base_ts)
    out = df.select(
        # ~0.3% duplicate ids, ~0.16% NULL keys (reference: 15 dup / 8 NULL per 5000)
        F.when(F.col("u1") < 0.0016, None)
        .when(F.col("u1") < 0.0046, (F.col("id") - 1).cast("double"))
        .otherwise(F.col("id").cast("double"))
        .alias("traffic_id"),
        _dirty_timestamp(ts, F.col("u2")).alias("date_time"),
        F.when(F.col("u3") < 0.5, None).otherwise(F.lit("London")).alias("city"),
        F.when(F.col("u4") < 1 / 6, None).otherwise(_choice(AREAS, F.col("u4"))).alias("area"),
        F.when(F.col("u5") < 0.05, F.round(F.rand(seed + 20) * 15000 + 10000, 0))
        .when(F.col("u5") < 0.10, None)
        .otherwise(F.round(F.col("u5") * 5000, 0))
        .alias("vehicle_count"),
        F.when(F.col("u6") < 0.05, -F.round(F.rand(seed + 21) * 19 + 1, 1))
        .when(F.col("u6") < 0.10, None)
        .otherwise(F.round(F.col("u6") * 117 + 3, 1))
        .alias("avg_speed_kmh"),
        F.when(F.col("u7") < 0.02, F.round(F.rand(seed + 22) * 40 + 20, 0))
        .when(F.col("u7") < 0.07, None)
        .otherwise(F.round(F.col("u7") * 10, 0))
        .alias("accident_count"),
        F.when(F.col("u8") < 0.25, None).otherwise(_choice(CONGESTION, F.col("u8"))).alias("congestion_level"),
        F.when(F.col("u9") < 0.20, None).otherwise(_choice(ROAD, F.col("u9"))).alias("road_condition"),
        F.when(F.col("u0") < 0.05, F.round(F.rand(seed + 23) * 30000 + 20000, 0))
        .when(F.col("u0") < 0.10, None)
        .otherwise(F.round(F.col("u0") * 9950 + 50, 0))
        .alias("visibility_m"),
    )
    return out


def generate_weather_raw(spark: SparkSession, n: int = 5000, seed: int = 137) -> DataFrame:
    from urban_traffic_data_lake_project_spark.functions import season_from_month

    base_ts = F.to_timestamp(F.lit("2025-01-01 00:00:00"))
    df = spark.range(n).select(
        F.col("id"),
        *[F.rand(seed + i).alias(f"u{i}") for i in range(10)],
    )
    ts = F.timestamp_add("MINUTE", (F.col("u0") * 60 * 24 * 180).cast("int"), base_ts)
    # the mixed-type dirty column (ints as strings + garbage strings)
    visibility = (
        F.when(F.col("u8") < 0.01, F.lit("Unknown"))
        .when(F.col("u8") < 0.02, F.lit("NaN"))
        .when(F.col("u8") < 0.03, F.lit("xxx"))
        .when(F.col("u8") < 0.05, F.lit("50000"))
        .when(F.col("u8") < 0.10, None)
        .otherwise(F.round(F.col("u8") * 9950 + 50, 0).cast("long").cast("string"))
    )
    out = df.select(
        F.when(F.col("u1") < 0.002, None)
        .when(F.col("u1") < 0.006, (F.col("id") - 1).cast("double"))
        .otherwise(F.col("id").cast("double"))
        .alias("weather_id"),
        _dirty_timestamp(ts, F.col("u2")).alias("date_time"),
        F.when(F.col("u3") < 0.5, None).otherwise(F.lit("London")).alias("city"),
        F.when(F.col("u4") < 0.05, F.lit("FoggySeason"))
        .when(F.col("u4") < 0.10, None)
        .otherwise(season_from_month(F.month(ts)))
        .alias("season"),
        F.when(F.col("u5") < 0.03, F.when(F.col("u5") < 0.015, -30.0).otherwise(60.0))
        .when(F.col("u5") < 0.08, None)
        .otherwise(F.round(F.col("u5") * 40 - 5, 1))
        .alias("temperature_c"),
        F.when(F.col("u6") < 0.03, F.when(F.col("u6") < 0.015, -10.0).otherwise(150.0))
        .when(F.col("u6") < 0.08, None)
        .otherwise(F.round(F.col("u6") * 80 + 20, 1))
        .alias("humidity"),
        F.when(F.col("u7") < 0.03, F.round(F.rand(seed + 20) * 80 + 120, 1))
        .when(F.col("u7") < 0.08, None)
        .otherwise(F.round(F.col("u7") * 50, 1))
        .alias("rain_mm"),
        F.when(F.col("u9") < 0.03, F.round(F.rand(seed + 21) * 100 + 200, 1))
        .when(F.col("u9") < 0.08, None)
        .otherwise(F.round(F.col("u9") * 80, 1))
        .alias("wind_speed_kmh"),
        visibility.alias("visibility_m"),
        F.when(F.col("u0") < 1 / 6, None).otherwise(_choice(WEATHER, F.col("u0"))).alias("weather_condition"),
    )
    return out
