"""Banded phash Hamming join (images/udfs.py phash_hamming_pairs):
exactness against a brute-force all-pairs oracle (the pigeonhole band
guarantee means recall AND precision must both be perfect for
hamming <= 3), and a plan-shape lock that the candidate stage is one
equi-join, never a cartesian product.
"""

from pyspark.sql import functions as F

from web_crawler_search_engine_spark.images.udfs import phash_hamming_pairs
from web_crawler_search_engine_spark.plans.catalog import _image_neardup_rows


def _brute_force(rows, max_hamming=3):
    out = set()
    for i, (ida, pa) in enumerate(rows):
        for idb, pb in rows[i + 1 :]:
            h = bin((pa % (1 << 64)) ^ (pb % (1 << 64))).count("1")
            if h <= max_hamming:
                a, b = sorted((ida, idb))
                out.add((a, b, h))
    return out


def test_phash_hamming_pairs_matches_brute_force(spark):
    rows = _image_neardup_rows()
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_hamming_pairs(df).collect()
    }
    want = _brute_force(rows)
    assert got == want
    # the planted variants guarantee a non-trivial pair set with
    # every hamming distance 0..3 represented
    assert {h for (_, _, h) in want} == {0, 1, 2, 3}


def test_phash_hamming_pairs_full_negative_range(spark):
    # hashes straddling the int64 sign bit: logical-shift band
    # extraction must still find the planted hamming-1 pair
    base = -(1 << 63)  # 0x8000000000000000
    rows = [("a", base), ("b", base ^ 1), ("c", 0), ("d", (1 << 62) - 1)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_hamming_pairs(df).collect()
    }
    # a^b flips bit 0 (h=1); a and c differ only in the sign bit
    # (h=1); b vs c differs in both (h=2) — all three are real pairs
    assert (
        got
        == _brute_force(rows)
        == {("a", "b", 1), ("a", "c", 1), ("b", "c", 2)}
    )


def test_phash_hamming_pairs_plan_is_equi_join(spark):
    df = spark.createDataFrame(
        _image_neardup_rows(), "image_id string, phash long"
    )
    plan = (
        phash_hamming_pairs(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_caption_carry_keeps_first_seen_per_cluster(spark):
    from web_crawler_search_engine_spark.plans.catalog import (
        _caption_carry_rows,
        q_caption_carry,
    )

    rows = _caption_carry_rows()
    by_phash: dict[int, list] = {}
    for iid, url, ph, cap in rows:
        by_phash.setdefault(ph, []).append(
            {"image_id": iid, "url": url, "caption": cap}
        )
    # the alt re-posts guarantee multi-caption clusters exist, so the
    # ordered-distinct aggregation is actually exercised
    assert any(
        len({m["caption"] for m in ms}) > 1 for ms in by_phash.values()
    )
    got = {r["phash"]: r for r in q_caption_carry(spark, "").collect()}
    assert set(got) == set(by_phash)
    for ph, members in by_phash.items():
        keeper = min(members, key=lambda r: r["url"])["image_id"]
        assert got[ph]["kept_image"] == keeper
        assert got[ph]["n_images"] == len(members)
        caps = sorted({m["caption"] for m in members})
        assert got[ph]["captions"] == "|".join(caps)


def _random_phashes(n=300, seed=11):
    """Seeded adversarial phash generator (batched — one Spark job for
    all examples, the repo's property-test pattern): uniform random
    64-bit values plus planted structure — exact dups, 1-3-bit
    perturbations, band-boundary values, sign-bit straddles."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        v = rng.getrandbits(64)
        rows.append((f"r{i}", v - (1 << 64) if v >= 1 << 63 else v))
    planted = []
    for i in range(0, n, 7):
        iid, ph = rows[i]
        kind = (i // 7) % 4
        if kind == 0:
            v = ph  # exact dup
        elif kind == 1:
            v = ph ^ (1 << rng.randrange(64))  # 1 bit
        elif kind == 2:
            m = (1 << rng.randrange(64)) | (1 << rng.randrange(64))
            v = ph ^ m  # 1-2 bits
        else:
            v = ph ^ 0x8000000000000001  # sign bit + bit 0
        v %= 1 << 64
        planted.append((f"{iid}p", v - (1 << 64) if v >= 1 << 63 else v))
    return rows + planted


def test_phash_hamming_pairs_property_batch(spark):
    rows = _random_phashes()
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_hamming_pairs(df).collect()
    }
    want = _brute_force(rows)
    assert got == want
    assert len(want) >= 40  # the ~43 planted pairs are actually found
