"""Skew-aware join utilities — the manual escape hatches for when AQE's
skew-join split isn't available (non-shuffle-joins, streaming) or a key's
skew is known ahead of time.

Reference analogue: Trino handles build-side skew via partitioned spilling
(HashBuilderOperator SPILLING_INPUT state); Spark's AQE splits skewed
partitions at runtime (spark.sql.adaptive.skewJoin.*, on by default in the
engine session). ``salted_join`` is the static alternative: explode the
small side S ways, salt the big side's key, join on (key, salt) — shuffle
spreads each hot key over S reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: big side gets a random salt in [0, salt),
    small side is replicated ``salt`` times (explode — rows * salt, fine for
    dimension-sized inputs). Result columns = big ∪ small minus helper cols.

    Use when one key holds a disproportionate share of the big side (power-law
    user_ids, null-heavy foreign keys). Cost model: small side grows x salt;
    each reducer sees ~1/salt of every hot key."""
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = salted_big.join(
        salted_small,
        (F.col(big_key) == F.col(small_key)) & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return joined.drop("__salt")


def top_keys(df: DataFrame, key: str, n: int = 20) -> DataFrame:
    """Skew diagnosis: the n heaviest keys with their share of rows."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.round(F.col("cnt") / total, 6))
        .orderBy(F.col("cnt").desc())
        .limit(n)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist bucketed-by-join-key (Spark managed table): co-located,
    shuffle-free joins between tables bucketed on the same key/count —
    the static analogue of Trino's bucketed Hive tables. At 100 TB, bucket
    fact tables on their dominant join key so repeated joins skip the
    exchange entirely."""
    w = df.write.format(fmt).mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)
