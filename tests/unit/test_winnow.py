"""Winnowing fingerprint guarantees (Schleimer et al. 2003, §2): with
k-gram size k=3 and window w=4, any shared token run of length
>= w + k - 1 = 6 MUST yield at least one shared fingerprint, and the
fingerprint density is bounded (far fewer fingerprints than k-grams).
"""

import numpy as np

from web_crawler_search_engine_spark.plans.catalog import q_winnow_fingerprints


def _write_docs(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t, "test") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_shared_run_yields_shared_fingerprint(spark, tmp_path):
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(200)]
    shared = "alpha beta gamma delta epsilon zeta"  # 6-token run
    texts = []
    for _ in range(8):
        pre = " ".join(rng.choice(vocab, rng.randint(5, 30)))
        post = " ".join(rng.choice(vocab, rng.randint(5, 30)))
        texts.append(f"{pre} {shared} {post}")
    sf = _write_docs(spark, tmp_path, texts)
    rows = q_winnow_fingerprints(spark, sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert len(by_doc) == 8
    common = set.intersection(*by_doc.values())
    assert common, "6-token shared run must produce a shared fingerprint"


def test_density_and_short_doc_edge(spark, tmp_path):
    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(500)]
    long_text = " ".join(rng.choice(vocab, 400))
    sf = _write_docs(
        spark, tmp_path, [long_text, "one two", "a b c", ""]
    )
    rows = q_winnow_fingerprints(spark, sf).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: ~398 k-grams; winnowing density ~2/(w+1)=0.4 -> well under
    n0 = len(per_doc[0])
    assert 40 < n0 < 250, n0
    # "one two" (<3 tokens): no k-grams, no rows; "a b c": exactly one
    assert 1 not in per_doc
    assert len(per_doc.get(2, [])) == 1
    assert 3 not in per_doc


def test_winnow_plan_single_shuffle(spark, tmp_path):
    """Plan-shape lock: both window passes (count + min) and the
    distinct's partial aggregate must share ONE Exchange on doc_id —
    a second shuffle at k-gram volume would be the scale bug."""
    sf = _write_docs(spark, tmp_path, ["a b c d e f g h i j"])
    df = q_winnow_fingerprints(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange ")
    assert n_exchange <= 2, plan  # kgram->doc_id shuffle + final distinct
    assert plan.count("Window") == 2
