"""Scalar-function surface (SURVEY.md §2.7 F1-F5) and multimodal plumbing
queries. Date/season bucketing mirrors the reference's
``derive_season_from_date`` (generate_weather_data.py:26-44); string/math
scalars cover the F2/F4 families; the random family (F3) is stochastic ->
moments query with distributional pytest assertions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.functions import season_from_month
from urban_traffic_data_lake_project_spark.operators import multimodal as MM
from urban_traffic_data_lake_project_spark.queries.base import ROUND_STAT, QuerySpec
from urban_traffic_data_lake_project_spark.sources import load_table


# ---------------------------------------------------------------------------
# scalar_date_functions — F1: extraction, formatting, season bucketing
# ---------------------------------------------------------------------------
def _date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        season_from_month(F.month("o_orderdate")).alias("season"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate")).alias("days_to_2002"),
    )


_DATE_SQL = """
SELECT o_orderkey,
       year(o_orderdate)  AS order_year,
       month(o_orderdate) AS order_month,
       day(o_orderdate)   AS order_day,
       strftime(o_orderdate, '%Y-%m') AS order_ym,
       CASE WHEN month(o_orderdate) IN (12, 1, 2) THEN 'Winter'
            WHEN month(o_orderdate) IN (3, 4, 5)  THEN 'Spring'
            WHEN month(o_orderdate) IN (6, 7, 8)  THEN 'Summer'
            ELSE 'Autumn' END AS season,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
FROM orders
"""


# ---------------------------------------------------------------------------
# scalar_string_math — F2/F4: string predicates + arithmetic
# ---------------------------------------------------------------------------
def _string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.col("p_name").contains("green").cast("int").alias("has_green"),
        F.col("p_type").endswith("BRASS").cast("int").alias("is_brass"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("abs_dev_1000"),
        F.round((F.col("p_retailprice") * 1.1 + F.col("p_size")) / 2.0, ROUND_STAT).alias("blended"),
    )


_STRING_MATH_SQL = f"""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green,
       CASE WHEN p_type LIKE '%BRASS' THEN 1 ELSE 0 END AS is_brass,
       string_split(p_name, ' ')[1] AS first_word,
       round(abs(p_retailprice - 1000.0), 2) AS abs_dev_1000,
       round((p_retailprice * 1.1 + p_size) / 2.0, {ROUND_STAT}) AS blended
FROM part
"""


# ---------------------------------------------------------------------------
# scalar_random_moments — F3 rand/randn/choice (stochastic -> rows-only;
# tests assert the moments distributionally)
# ---------------------------------------------------------------------------
def _random_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = 100_000
    choices = F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("d"))
    df = spark.range(n).select(
        F.rand(42).alias("u"),
        F.randn(43).alias("z"),
        F.element_at(choices, (F.floor(F.rand(44) * 4) + 1).cast("int")).alias("pick"),
    )
    return df.agg(
        F.round(F.avg("u"), 2).alias("mean_u"),
        F.round(F.stddev_pop("u"), 2).alias("std_u"),
        F.round(F.avg("z"), 1).alias("mean_z"),
        F.round(F.stddev_pop("z"), 1).alias("std_z"),
        F.countDistinct("pick").alias("n_choices"),
    )


# ---------------------------------------------------------------------------
# multimodal_ingest — binary payload + typed metadata contract (oracle on
# the deterministic parts: byte length + content digest)
# ---------------------------------------------------------------------------
def _mm_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    media = MM.ingest_binary(docs, "doc_id", "payload", "image", "png")
    return media.select(
        "media_id",
        "media_type",
        "format",
        "byte_len",
        F.md5("payload").alias("payload_md5"),
    )


_MM_INGEST_SQL = """
SELECT doc_id AS media_id,
       'image' AS media_type,
       'png' AS format,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS payload_md5
FROM documents
"""


# ---------------------------------------------------------------------------
# multimodal_features — stubbed decode + deterministic fake features
# (rows-only: the feature bytes come from a Python-side RNG)
# ---------------------------------------------------------------------------
def _mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    media = MM.ingest_binary(docs, "doc_id", "payload", "image", "png")
    media = MM.decode_metadata(media)
    return MM.extract_features(media)


# ---------------------------------------------------------------------------
# arr_vector_stats — array-column functions (size, min/max, mean, L2 norm)
# ---------------------------------------------------------------------------
def _vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mean = F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / F.size(v)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_min(v), ROUND_STAT).alias("min_v"),
        F.round(F.array_max(v), ROUND_STAT).alias("max_v"),
        F.round(mean, ROUND_STAT).alias("mean_v"),
        F.round(norm, ROUND_STAT).alias("l2_norm"),
    )


_VECTOR_STATS_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT vec_id,
       len(e) AS dim,
       round(list_min(e), {ROUND_STAT}) AS min_v,
       round(list_max(e), {ROUND_STAT}) AS max_v,
       round(list_sum(e) / len(e), {ROUND_STAT}) AS mean_v,
       round(sqrt(list_sum(list_transform(e, x -> x * x))), {ROUND_STAT}) AS l2_norm
FROM v
"""


# ---------------------------------------------------------------------------
# scalar_subquery — correlated scalar subquery: orders above their
# customer's average order value
# ---------------------------------------------------------------------------
def _scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cust_avg = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("cust_avg"))
    return (
        o.join(cust_avg, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


_SCALAR_SUBQUERY_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders o
WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
"""


REGISTRY: dict[str, QuerySpec] = {
    "arr_vector_stats": QuerySpec(_vector_stats, _VECTOR_STATS_SQL, "array/vector column functions", ("scalar", "array")),
    "scalar_subquery": QuerySpec(_scalar_subquery, _SCALAR_SUBQUERY_SQL, "correlated scalar subquery", ("scalar", "join")),
    "scalar_date_functions": QuerySpec(_date_functions, _DATE_SQL, "F1 date extraction/format/season", ("scalar",)),
    "scalar_string_math": QuerySpec(_string_math, _STRING_MATH_SQL, "F2/F4 string + math scalars", ("scalar",)),
    "scalar_random_moments": QuerySpec(_random_moments, None, "F3 random generators (moments)", ("scalar", "stochastic")),
    "multimodal_ingest": QuerySpec(_mm_ingest, _MM_INGEST_SQL, "binary payload + typed metadata", ("multimodal",)),
    "multimodal_features": QuerySpec(_mm_features, None, "stub decode + fake features via mapInPandas", ("multimodal",)),
}
