"""The two payload modes of fetch_and_parse (JVM-side equi-join vs
UDF-resident broadcast store) must produce identical rows — the store
mode is the default fetcher model, the join mode the payload-as-table
path."""

from __future__ import annotations

import pytest

from crusty_spark import fetch as FE
from crusty_spark import frontier as FR
from crusty_spark.fixtures import images_df, seed_urls


# 32 = the usual power-of-two, 48 = NOT a power of two: the store mode's
# index modulo must follow pmod semantics on the signed hash (negative
# final hashes occur on ~50% of rows), which a u64 modulo only matches
# when n_images is a power of two.
@pytest.mark.parametrize("n_images", [32, 48])
def test_fetch_modes_identical(spark, n_images):
    cfg = FR.CrawlConfig(shard_total=4)
    tasks = FR.identity_for_urls(
        spark.createDataFrame([(u,) for u in seed_urls(40)], ["url"]), cfg
    )
    images = images_df(spark, n_images).cache()
    images.count()
    store = FE.payload_store(images)
    cols = [f.name for f in FE.PARSE_SCHEMA.fields]
    a = sorted(
        map(tuple, FE.fetch_and_parse(tasks, images, n_images).select(cols).collect())
    )
    b = sorted(
        map(
            tuple,
            FE.fetch_and_parse(tasks, images, n_images, store_bc=store).select(cols).collect(),
        )
    )
    images.unpersist()
    assert a == b
    assert len(a) > 0


def test_crawler_payload_mode_auto_select(spark, tmp_path, monkeypatch):
    """Default payload mode is auto-selected by table size: a small
    payload universe broadcasts into the UDF store; a table above
    PAYLOAD_STORE_MAX_ROWS takes the scalable equi-join path (no
    driver-side collect of the payload bytes)."""
    from crusty_spark.crawler import Crawler
    from crusty_spark.fixtures import images_df

    images = images_df(spark, 32).cache()
    small = Crawler(spark, images, 32, str(tmp_path / "a"))
    assert small.store_bc is not None  # fits: UDF-resident store

    monkeypatch.setattr(Crawler, "PAYLOAD_STORE_MAX_ROWS", 8)
    big = Crawler(spark, images, 32, str(tmp_path / "b"))
    assert big.store_bc is None  # "big" table: join mode, no collect
    forced = Crawler(spark, images, 32, str(tmp_path / "c"), payload_in_udf=True)
    assert forced.store_bc is not None  # explicit override still wins
    images.unpersist()
