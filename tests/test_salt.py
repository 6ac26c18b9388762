"""Skew-join strategies return exactly the plain join's rows (SURVEY §2 D3)."""

from pyspark.sql import functions as F

from kgx.shuffle.salt import hot_cold_join, salted_join


def _tables(spark):
    # key 1 is hot (300 rows), keys 2..20 cold
    big = spark.range(0, 300).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    big = big.unionByName(
        spark.range(2, 21).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    )
    small = spark.range(1, 21).select(F.col("id").alias("k"), (F.col("id") + 1000).alias("label"))
    return big, small


def test_hot_cold_join_matches_plain_join(spark):
    big, small = _tables(spark)
    expected = sorted(big.join(small, "k").select("k", "v", "label").collect())
    got = sorted(hot_cold_join(big, small, "k", hot_threshold=100).select("k", "v", "label").collect())
    assert got == expected


def test_salted_join_matches_plain_join(spark):
    big, small = _tables(spark)
    expected = sorted(big.join(small, "k").select("k", "v", "label").collect())
    got = sorted(
        salted_join(big, small, "k", salt_source=F.col("v"), n_salts=8)
        .select("k", "v", "label")
        .collect()
    )
    assert got == expected
