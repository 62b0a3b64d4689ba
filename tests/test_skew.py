"""Salted repartition must spread the dominant codec across tasks."""

from pyspark.sql import functions as F

from hydra_spark.operators.skew import salted_repartition


def test_plain_codec_partitioning_is_skewed(spark, clips):
    plain = clips.repartition(8, "codec")
    sizes = (
        plain.withColumn("pid", F.spark_partition_id()).groupBy("pid").count().toPandas()
    )
    assert sizes["count"].max() / clips.count() > 0.5  # pcm16 ~80% in one task


def test_salted_repartition_balances(spark, clips):
    spread = salted_repartition(clips, 8, "codec", "sr_hz")
    sizes = (
        spread.withColumn("pid", F.spark_partition_id()).groupBy("pid").count().toPandas()
    )
    n = clips.count()
    assert len(sizes) == 8
    assert sizes["count"].max() / n < 0.35  # dominant codec spread out
    # pcm16 rows present in most partitions
    p16 = (
        spread.where(F.col("codec") == "pcm16")
        .withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .count()
    )
    assert p16 >= 6
