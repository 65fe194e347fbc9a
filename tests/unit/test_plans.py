"""Physical-plan shape regressions: the catalog queries must keep the
plans they were designed for — filters reaching the parquet scan,
columns pruned, small sides broadcast, top-k as TakeOrderedAndProject.
A correctness-passing query with a degraded plan fails here."""

import contextlib
import io

from web_crawler_search_engine_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark):
    p = _plan(catalog.q_pricing_summary(spark, SF))
    # shipdate predicate reaches the parquet scan
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters")[1].split("\n")[0]
    # column pruning: the 11-column table reads only the 7 needed
    read = p.split("ReadSchema")[1].split("\n")[0]
    assert "l_comment" not in read
    for c in ("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"):
        assert c in read
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_search_top5_is_take_ordered_with_broadcast(spark):
    p = _plan(catalog.q_search_top5(spark, SF))
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p
    # the BUILD side must be the 5-row top, never the corpus-sized docs
    # table: the top side is composed on the left, so every broadcast
    # join here is BuildLeft (a BuildRight would mean docs got built)
    assert "BuildLeft" in p and "BuildRight" not in p


def test_semi_and_anti_joins_planned_as_joins(spark):
    p_semi = _plan(catalog.q_semi_join_parts(spark, SF))
    assert "LeftSemi" in p_semi
    p_anti = _plan(catalog.q_anti_join_seen(spark, SF))
    assert "LeftAnti" in p_anti


def test_url_canonicalize_single_stage_no_shuffle(spark):
    p = _plan(catalog.q_url_canonicalize(spark, SF))
    assert "Exchange" not in p  # pure per-row projection, no shuffle
    read = p.split("ReadSchema")[1].split("\n")[0]
    assert "props" not in read and "value" not in read


def test_top5_orders_broadcasts_dimensions(spark):
    p = _plan(catalog.q_top5_orders(spark, SF))
    assert p.count("BroadcastHashJoin") >= 2  # both metadata lookups
    # both joins build the k-row ranked side (composed left), never the
    # data-sized orders/customer tables — the 100 TB-fatal shape
    assert "BuildRight" not in p
    assert p.count("BuildLeft") >= 2


def test_lang_id_broadcasts_stopword_dim(spark):
    p = _plan(catalog.q_lang_id(spark, SF))
    assert "BroadcastHashJoin" in p


def test_skinny_admit_windows_never_shuffle_full_rows(spark):
    """admit(key_col=...) ranks a skinny projection and semi-joins the
    admitted keys back: the windowed exchanges must not carry the wide
    payload columns, and the join-back is a broadcast LeftSemi."""
    from pyspark.sql import functions as F

    from web_crawler_search_engine_spark.operators.scheduler import admit

    cand = spark.range(0, 5000).select(
        F.xxhash64("id").alias("url_key"),
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        F.col("id").alias("discovery_seq"),
        F.lit(4).alias("quota"),
    )
    out = admit(cand, max_quota=4, salt_buckets=4, key_col="url_key")
    rows = out.collect()
    want = {
        r["url_key"]
        for r in admit(cand, max_quota=4, salt_buckets=4).collect()
    }
    assert {r["url_key"] for r in rows} == want and len(rows) == len(want)
    p = _plan(out)
    assert "LeftSemi" in p and "BroadcastHashJoin" in p
    # every shuffle (windowed ranking) moves only skinny columns: the
    # Exchange nodes' Input lists must not carry the url payload
    import re

    for m in re.finditer(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", p):
        assert "url#" not in m.group(1).replace("url_key#", "k#"), m.group(1)


def test_decontaminate_broadcasts_bounded_probe_set(spark):
    """The probe side is benchmark-sized (bounded), so it must come in
    as a broadcast; the training side must never be broadcast."""
    p = _plan(catalog.q_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in p


def test_perplexity_bucket_has_no_single_partition_window(spark):
    """The tercile cut must ride the distributed rank
    (assign_global_seq), never a global ntile: every Window in the
    plan must have a partition spec, and there must be no
    SinglePartition exchange feeding a Window."""
    p = _plan(catalog.q_perplexity_bucket(spark, SF))
    assert "ntile" not in p.lower()
    for chunk in p.split("Window")[1:]:
        head = chunk.split("\n")[0]
        # formatted plans render the spec as
        # [..., partition_spec, order_spec]; a global window renders
        # an empty partition list
        assert "SinglePartition" not in head
    assert "SinglePartition" not in p


def test_weighted_sample_is_take_ordered_no_shuffle(spark):
    """A-ES weighted sampling: global top-K as TakeOrderedAndProject
    (per-partition heaps, no full sort, no Exchange) over a
    text-pruned scan."""
    p = _plan(catalog.q_weighted_sample(spark, SF))
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p
    read = p.split("ReadSchema")[1].split("\n")[0]
    assert "text" not in read and "n_chars" in read


def test_pack_contexts_single_source_partitioned_window(spark):
    """Packing shuffles ONCE (into the source shards) and its window
    is never global."""
    p = _plan(catalog.q_pack_contexts(spark, SF))
    assert p.count(") Exchange") == 1
    assert "SinglePartition" not in p


def test_domain_mix_single_corpus_scan(spark):
    """The normalizing total must reuse the one aggregate (whole-frame
    window over source-cardinality rows), not re-scan the corpus."""
    p = _plan(catalog.q_domain_mix(spark, SF))
    assert p.count(") Scan parquet") == 1


def test_image_pack_sharded_window_single_exchange(spark):
    """Image packing shuffles ONCE (into the (aspect, host) shards);
    the running-offset window is never global."""
    p = _plan(catalog.q_image_pack(spark, SF))
    assert p.count(") Exchange") == 1
    assert "SinglePartition" not in p


def test_image_align_jvm_only_partial_agg(spark):
    """The CLIP-stand-in gate stays JVM-side (no Python eval in the
    plan) and the per-image rollup is map-side combined (partial +
    final HashAggregate pair), so the one shuffle carries skinny
    (image_id, hit) pairs."""
    p = _plan(catalog.q_image_align(spark, SF))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("HashAggregate") >= 2
    assert "partial_count" in p or "partial" in p


def test_robots_fetch_once_builds_the_bounded_side(spark):
    """S5's first-contact robots fetch must never broadcast the
    host-scaled robots source. The semantically-equivalent outer join
    can ONLY build its non-preserved (robots) side — Spark silently
    drops a broadcast hint on the preserved side — so the operator is
    composed as semi + anti, each building the batch-bounded set."""
    from pyspark.sql import functions as F

    from web_crawler_search_engine_spark.plans.crawl import (
        robots_fetch_once,
    )

    robots_src = spark.range(0, 100_000).select(
        F.concat(F.lit("h"), F.col("id")).alias("host"),
        F.lit("User-agent: *").alias("rules"),
    )
    # 25 hosts robots_src knows (h0..h24), 25 it has never seen
    new_hosts = spark.range(0, 50).select(
        F.when(
            F.col("id") < 25, F.concat(F.lit("h"), F.col("id"))
        )
        .otherwise(F.concat(F.lit("nosuch"), F.col("id")))
        .alias("host")
    )
    fetched, hit = robots_fetch_once(
        robots_src, new_hosts, lambda rules: F.lit(0.5), 3
    )
    try:
        p = _plan(fetched)
        # both joins build right = the bounded set; the outer form
        # would show a RightOuter/LeftOuter building robots_src
        assert "LeftSemi" in p and "LeftAnti" in p
        assert "Outer" not in p
        for frag in p.split("BroadcastHashJoin")[1:]:
            assert "BuildLeft" not in frag.split("\n")[0]
        # semantics: every first-contact host exactly once, null rules
        # where robots_src has no row
        rows = {r["host"]: r for r in fetched.collect()}
        assert len(rows) == 50
        assert rows["h0"]["rules"] is not None
        assert rows["nosuch30"]["rules"] is None
        assert all(r["fetched"] and r["fetch_round"] == 3 for r in rows.values())
    finally:
        hit.unpersist()


def test_ttl_seen_view_semi_pushes_below_aggregate(spark, tmp_path_factory):
    """The TTL liveness view (_seen_keys with recrawl_ttl) is a
    groupBy(url_key) over the frontier log; its scale contract says
    the accelerated backstop restricts that aggregate to the maybe
    keys, so the per-key max runs over the maybe keys' history only —
    never O(frontier). Catalyst CANNOT do this itself: the expiry
    Filter on top of the aggregate blocks PushDownLeftSemiAntiJoin
    (asserted below as the negative control), so _seen_view hands the
    accel helpers a callable that semi-joins the LOG below the
    aggregate manually. Lock both facts: the restricted view's plan
    has the Aggregate as the PARENT of the LeftSemi, and the naive
    composition does not."""
    from web_crawler_search_engine_spark.plans.crawl import (
        CrawlConfig,
        CrawlJob,
    )
    from web_crawler_search_engine_spark.sources.corpus import (
        POLITENESS,
        USER_AGENT,
        corpus_df,
        generate_world,
        robots_src_df,
    )
    from pyspark.sql import functions as F

    world = generate_world(n=20, hosts=2, seed=3, with_images=False)
    cfg = CrawlConfig(
        root_domains=world.root_domains,
        user_agent=USER_AGENT,
        politeness=POLITENESS,
        recrawl_ttl=2,
        salt_buckets=2,
        host_buckets=2,
    )
    job = CrawlJob(
        spark,
        corpus_df(spark, world),
        robots_src_df(spark, world),
        cfg,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_ttl_plan")),
    )
    job.start(world.seeds)
    job.run_round()
    maybe = spark.range(5).select(F.xxhash64("id").alias("url_key"))

    # the engine's actual shape: the restricted view from _seen_view
    seen_view = job._seen_view()
    assert callable(seen_view)
    matched = seen_view(maybe).join(
        F.broadcast(maybe), "url_key", "left_semi"
    )
    plan = matched._jdf.queryExecution().optimizedPlan().toString()
    agg_at = plan.find("Aggregate")
    assert agg_at != -1, plan
    # a LeftSemi must appear BELOW the aggregate (the restriction);
    # the helper's outer semi above it is redundant-but-harmless
    assert plan.find("LeftSemi", agg_at) != -1, (
        "restriction not below the TTL aggregate:\n" + plan
    )
    # results identical to the unrestricted view ∩ maybe
    want = sorted(
        r["url_key"]
        for r in job._seen_keys()
        .join(F.broadcast(maybe), "url_key", "left_semi")
        .collect()
    )
    assert sorted(r["url_key"] for r in matched.collect()) == want

    # negative control: the naive composition stays blocked by the
    # expiry Filter — if Spark ever learns this pushdown, this fires
    # and the manual restriction can be retired
    naive = job._seen_keys().join(F.broadcast(maybe), "url_key", "left_semi")
    np = naive._jdf.queryExecution().optimizedPlan().toString()
    assert np.find("LeftSemi", np.find("Aggregate")) == -1, np
