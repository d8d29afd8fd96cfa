"""Bucketed co-located joins: pre-bucketing both sides of a recurring
join key eliminates the per-query shuffle — the storage-layout lever for
repeated referential checks at 100 TB (SURVEY §4.2 'reuse a partitioning
across stages')."""

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .option("path", str(base / "li")).mode("overwrite")
     .saveAsTable("li_b"))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .option("path", str(base / "o")).mode("overwrite")
     .saveAsTable("o_b"))
    return spark.table("li_b"), spark.table("o_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    li, o = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey) \
                   .groupBy("o_orderstatus") \
                   .agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(joined)
        # the join itself must not shuffle either side: only the final
        # tiny aggregate exchanges
        n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
        assert n_exchanges <= 1, plan
        assert joined.count() == 3
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    li, o = bucketed_tables
    plain_li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain_o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    a = li.join(o, li.l_orderkey == o.o_orderkey).count()
    b = plain_li.join(plain_o,
                      plain_li.l_orderkey == plain_o.o_orderkey).count()
    assert a == b
