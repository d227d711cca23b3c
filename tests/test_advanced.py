"""Bucketed joins (shuffle elision) and custom stateful streaming."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from python_nyc_taxi_data_pipeline_spark.catalog import load
from python_nyc_taxi_data_pipeline_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from python_nyc_taxi_data_pipeline_spark.streaming.jobs import read_event_stream
from python_nyc_taxi_data_pipeline_spark.streaming.stateful import user_profiles

from tests.conftest import SF_DIR


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_elides_exchanges(spark):
    o = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["o_orderkey"], 8, sort_cols=["o_orderkey"])

    # at fixture scale the planner prefers broadcast; disable it so the
    # plan shows what happens at 100 TB where neither side broadcasts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = _plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and the result matches the plain join
        plain = o.join(li, "o_orderkey").count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_stateful_user_profiles_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    load(spark, SF_DIR, "events").select(
        "user_id", F.col("ts").cast("timestamp_ltz").alias("ts"), "value"
    ).repartition(3).write.parquet(src)

    from pyspark.sql import types as T

    stream = (
        spark.readStream.schema(
            T.StructType(
                [
                    T.StructField("user_id", T.LongType()),
                    T.StructField("ts", T.TimestampType()),
                    T.StructField("value", T.DoubleType()),
                ]
            )
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    profiles = user_profiles(stream)
    q = (
        profiles.writeStream.format("memory")
        .queryName("user_profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last emitted row per user must equal the batch aggregate
    latest = (
        spark.sql("SELECT * FROM user_profiles")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("tv"))
    )
    batch = (
        load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events_b"),
            F.round(F.sum("value"), 2).alias("tv_b"),
        )
    )
    j = latest.join(batch, "user_id")
    assert j.filter(F.col("n_events") != F.col("n_events_b")).count() == 0
    bad_tv = j.filter(F.abs(F.col("tv") - F.col("tv_b")) > 0.05).count()
    assert bad_tv == 0
