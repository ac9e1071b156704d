"""Unit for training.pipeline.curate_crawled_images: the crawl-output ->
training-input composition, with exact expected shards computed through
the bit-parity xxh64 twin."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from crusty_spark.fetch import PARSE_SCHEMA
from crusty_spark.hashing import spark_xxhash64_str
from crusty_spark.training.pipeline import curate_crawled_images

META_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def _parsed_row(url, image_id, caption, phash, status=200):
    """A PARSE_SCHEMA row with only the curation-relevant fields set."""
    base = {f.name: None for f in PARSE_SCHEMA.fields}
    base.update(
        url=url,
        url_hash=spark_xxhash64_str(url),
        domain="d.com",
        depth=0,
        status=status,
        n_redirects=0,
        content_type="image",
        image_id=image_id,
        caption=caption,
        phash=phash,
        oversize=False,
    )
    return tuple(base[f.name] for f in PARSE_SCHEMA.fields)


def test_curate_crawled_images_exact(spark):
    cap = "a cat sitting on a mat"
    rows = [
        # phash 11: fetched twice under two captions -> one canonical image
        _parsed_row("http://d.com/1", "imgA", cap, 11),
        _parsed_row("http://d.com/2", "imgB", "the cat on the mat", 11),
        # phash 22: single good fetch
        _parsed_row("http://d.com/3", "imgC", cap, 22),
        # failures and gate victims: non-200, no payload, bad fmt, tiny, short caption
        _parsed_row("http://d.com/4", "imgD", cap, 33, status=404),
        _parsed_row("http://d.com/5", None, None, None),
        _parsed_row("http://d.com/6", "imgE", cap, 44),  # gif (meta below)
        _parsed_row("http://d.com/7", "imgF", cap, 55),  # 8x8 (meta below)
        _parsed_row("http://d.com/8", "imgG", "hi", 66),  # 1-token caption
    ]
    parsed = spark.createDataFrame(rows, PARSE_SCHEMA)
    meta = [
        ("imgA", 64, 64, "png"),
        ("imgB", 64, 64, "png"),
        ("imgC", 64, 64, "jpeg"),
        ("imgD", 64, 64, "png"),
        ("imgE", 64, 64, "gif"),
        ("imgF", 8, 8, "png"),
        ("imgG", 64, 64, "png"),
    ]
    images = spark.createDataFrame(meta, META_SCHEMA)

    out = {r.shard: r for r in curate_crawled_images(parsed, images, n_shards=8).collect()}

    # survivors: {imgA, imgB} collapse to rep imgA (phash 11, 2 source
    # rows); imgC alone (phash 22, 1 source row)
    def shard_of(rep):
        return ((spark_xxhash64_str(rep) % 8) + 8) % 8

    expect = {}
    for rep, n_src in (("imgA", 2), ("imgC", 1)):
        s = shard_of(rep)
        n_img, n_rows = expect.get(s, (0, 0))
        expect[s] = (n_img + 1, n_rows + n_src)
    assert {s: (r.n_images, r.n_source_rows) for s, r in out.items()} == expect


def test_curate_crawled_images_no_python_after_parse(spark):
    """The curation stages downstream of fetch are pure JVM: build the
    composition over an already-parsed DataFrame and assert no Python
    eval node in its plan."""
    parsed = spark.createDataFrame([_parsed_row("http://d.com/1", "imgA", "a cat on a mat", 1)], PARSE_SCHEMA)
    images = spark.createDataFrame([("imgA", 64, 64, "png")], META_SCHEMA)
    plan = (
        curate_crawled_images(parsed, images, n_shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "FlatMapGroupsInPandas" not in plan
