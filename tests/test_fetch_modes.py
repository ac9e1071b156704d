"""The two payload modes of fetch_and_parse (JVM-side equi-join vs
UDF-resident broadcast store) must produce identical rows — the store
mode is the default fetcher model, the join mode the payload-as-table
path."""

from __future__ import annotations

from crusty_spark import fetch as FE
from crusty_spark import frontier as FR
from crusty_spark.fixtures import images_df, seed_urls


def test_fetch_modes_identical(spark):
    cfg = FR.CrawlConfig(shard_total=4)
    tasks = FR.identity_for_urls(
        spark.createDataFrame([(u,) for u in seed_urls(40)], ["url"]), cfg
    )
    images = images_df(spark, 32).cache()
    images.count()
    store = FE.payload_store(images)
    cols = [f.name for f in FE.PARSE_SCHEMA.fields]
    a = sorted(map(tuple, FE.fetch_and_parse(tasks, images, 32).select(cols).collect()))
    b = sorted(
        map(tuple, FE.fetch_and_parse(tasks, images, 32, store_bc=store).select(cols).collect())
    )
    images.unpersist()
    assert a == b
    assert len(a) > 0
