"""Units for training.curation: image+caption quality filter, caption
canonicalization, deterministic corpus mixing, export sharding."""

from __future__ import annotations

from pyspark.sql import functions as F

from crusty_spark.training import curation as C

PAIR_COLS = ["image_id", "w", "h", "fmt", "caption"]


def _pairs(spark):
    rows = [
        ("a", 640, 480, "png", "a fine portrait of a cat on a mat"),  # survives
        ("b", 32, 480, "png", "a fine portrait of a cat on a mat"),  # too narrow
        ("c", 640, 48, "png", "a fine portrait of a cat on a mat"),  # too short
        ("d", 900, 100, "png", "a fine portrait of a cat on a mat"),  # aspect 9:1
        ("e", 640, 480, "gif", "a fine portrait of a cat on a mat"),  # bad fmt
        ("f", 640, 480, "jpeg", "tiny caption"),  # 2 tokens
        ("g", 192, 64, "jpeg", "exactly three to one is fine"),  # aspect == 3 survives
    ]
    return spark.createDataFrame(rows, PAIR_COLS)


def test_filter_image_caption_each_gate_bites(spark):
    out = C.filter_image_caption(_pairs(spark)).orderBy("image_id").collect()
    assert [r.image_id for r in out] == ["a", "g"]
    # survivors carry the token count of the shared tokenizer
    assert out[0].n_caption_tokens == 9
    assert out[1].n_caption_tokens == 6


def test_filter_image_caption_plan_is_scan_side(spark):
    plan = C.filter_image_caption(_pairs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure predicates: no shuffle
    assert "EvalPython" not in plan and "Python" not in plan


def test_caption_canonicalize(spark):
    rows = [
        ("i2", 7, "zebra"),
        ("i1", 7, "aardvark"),
        ("i3", 7, "aardvark"),
        ("i9", 8, "only"),
    ]
    df = spark.createDataFrame(rows, ["image_id", "phash", "caption"])
    got = {r.phash: r for r in C.caption_canonicalize(df).collect()}
    assert got[7].rep_image_id == "i1"
    assert got[7].canon_caption == "aardvark"
    assert (got[7].n_rows, got[7].n_captions) == (3, 2)
    assert (got[8].n_rows, got[8].n_captions) == (1, 1)


def _docs(spark, n=400):
    # deterministic 3-strata corpus: ids 0..n-1, lang by residue
    return spark.range(n).select(
        F.col("id").cast("string").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.pmod("id", F.lit(4)) + 1).cast("int"),
        ).alias("lang"),
    )


def test_mix_plan_integer_semantics(spark):
    # counts: en 200, de 100, fr 100; weights 5:3:2 (W=10)
    # T = min(200*10//5, 100*10//3, 100*10//2) = min(400, 333, 500) = 333
    # targets: en 166, de 99, fr 66 — all <= counts, ratios ~ weights
    plan = {r.stratum: r for r in C.mix_plan(_docs(spark), "lang", {"en": 5, "de": 3, "fr": 2}).collect()}
    assert (plan["en"].n_total, plan["en"].n_target) == (200, 166)
    assert (plan["de"].n_total, plan["de"].n_target) == (100, 99)
    assert (plan["fr"].n_total, plan["fr"].n_target) == (100, 66)
    for r in plan.values():
        assert r.ppm == r.n_target * C.PPM // r.n_total


def test_mix_corpus_deterministic_subset_and_rates(spark):
    docs = _docs(spark)
    weights = {"en": 5, "de": 3, "fr": 2}
    s1 = sorted(r.doc_id for r in C.mix_corpus(docs, "lang", weights).collect())
    # repartition the input: membership is row-local, so the set is identical
    s2 = sorted(
        r.doc_id for r in C.mix_corpus(docs.repartition(7), "lang", weights).collect()
    )
    assert s1 == s2 and 0 < len(s1) < 400
    # sampled rows are a subset of their stratum and roughly hit targets
    plan = {r.stratum: r for r in C.mix_plan(docs, "lang", weights).collect()}
    got = (
        C.mix_corpus(docs, "lang", weights)
        .groupBy("lang")
        .count()
        .collect()
    )
    for r in got:
        assert abs(r["count"] - plan[r.lang].n_target) <= 0.2 * plan[r.lang].n_total


def test_mix_corpus_plan_broadcasts_the_plan_side(spark):
    df = C.mix_corpus(_docs(spark), "lang", {"en": 5, "de": 3, "fr": 2})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan  # the corpus side must not shuffle to join


def test_assign_shards_balanced_and_stable(spark):
    df = C.assign_shards(_docs(spark, 1000), key_col="doc_id", n_shards=8)
    rows = df.select("doc_id", "shard").collect()
    shards = {r.doc_id: r.shard for r in rows}
    assert all(0 <= s < 8 for s in shards.values())
    again = {
        r.doc_id: r.shard
        for r in C.assign_shards(_docs(spark, 1000).repartition(5), "doc_id", 8)
        .select("doc_id", "shard")
        .collect()
    }
    assert shards == again
    from collections import Counter

    by = Counter(shards.values())
    assert len(by) == 8 and max(by.values()) < 2 * min(by.values())


def test_mix_plan_absent_stratum_forces_zero_total(spark):
    # 'it' is weighted but absent from the corpus: the target ratios
    # are infeasible, so the plan must say 'sample nothing' (t_total 0)
    # instead of silently dropping the stratum from the min
    plan = {
        r.stratum: r
        for r in C.mix_plan(
            _docs(spark), "lang", {"en": 5, "de": 3, "fr": 2, "it": 1}
        ).collect()
    }
    assert set(plan) == {"en", "de", "fr", "it"}
    assert (plan["it"].n_total, plan["it"].n_target, plan["it"].ppm) == (0, 0, 0)
    for r in plan.values():
        assert r.n_target == 0 and r.ppm == 0
    # and the sampled corpus is empty under the infeasible weights
    assert C.mix_corpus(_docs(spark), "lang", {"en": 5, "de": 3, "fr": 2, "it": 1}).count() == 0
