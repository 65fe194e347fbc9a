"""spark-submit entry point for the image+caption curation pipeline
(graft cell pyspark × image; BASELINE.json input_hint schema).

No reference CLI analog — the reference stops at exact-phash dedup
inside the indexer (X3); this is the training-data curation job a user
of the engine runs over a crawled image+caption table:

    spark-submit --master <cluster> --py-files dist/engine.zip \
        jobs/curate_job.py \
        --input /path/to/corpus.parquet    # (image_id, bytes, w, h,
                                           #  fmt, caption, phash, url)
        --out /path/to/curated \
        [--synth N]          # synthesize an N-image corpus instead
        [--min-pixels 64] [--min-bpp 0.05] [--min-caption-tokens 10]
        [--max-hamming 3]

Stages (each a tested catalog operator, composed):
  1. metadata quality scores — pixel count, encoded bytes-per-pixel,
     caption token count (q_image_quality exprs),
  2. near-dup resolution — banded Hamming pairs over the stored phash
     (images/udfs.phash_hamming_pairs, 4×16-bit bands, no all-pairs)
     chained into connected components (min-label propagation), one
     survivor per cluster,
  3. keep = quality ∧ cluster-survivor; writes kept.parquet /
     dropped.parquet and prints one JSON metrics line.

Scale: every stage is a JVM Column expression or a banded equi-join;
CC iterations = dup-cluster diameter (tiny); nothing driver-sized.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def curate(corpus, min_pixels, min_bpp, min_caption_tokens, max_hamming):
    """corpus (input_hint schema) -> (scored DF with keep flags,
    metrics dict). Exposed for tests and notebook use."""
    from pyspark.sql import functions as F

    from web_crawler_search_engine_spark.images.udfs import (
        phash_hamming_pairs,
    )
    from web_crawler_search_engine_spark.plans.catalog import (
        _min_label_components,
    )

    n_pixels = (F.col("w") * F.col("h")).cast("long")
    n_bytes = F.length("bytes").cast("long")
    cap_toks = F.size(F.split("caption", " ")).cast("long")
    scored = corpus.withColumn("n_pixels", n_pixels).withColumn(
        "quality_keep",
        # coalesce: a null anywhere in the predicate (null bytes/w/h/
        # caption => null bpp or token count => three-valued null)
        # must DROP the row, not give it keep=NULL — a NULL keep
        # falls out of both the kept and dropped outputs and breaks
        # the metrics partition (input = kept + quality + neardup)
        F.coalesce(
            (n_pixels >= min_pixels)
            & ((n_bytes / n_pixels) >= min_bpp)
            & (cap_toks >= min_caption_tokens),
            F.lit(False),
        ),
    )

    ids = corpus.select("image_id", "phash")
    pairs = phash_hamming_pairs(
        ids, "image_id", "phash", max_hamming=max_hamming
    ).select("id_a", "id_b")
    clusters = _min_label_components(
        ids.select("image_id"), pairs, "image_id", "id_a", "id_b"
    ).select("image_id", F.col("keep").alias("survivor"))

    out = scored.join(clusters, "image_id", "left").withColumn(
        "keep", F.col("quality_keep") & F.coalesce("survivor", F.lit(True))
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description="image+caption curation")
    ap.add_argument("--input", default=None, help="corpus parquet path")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument(
        "--synth",
        type=int,
        default=None,
        help="synthesize an N-image seeded corpus instead of --input",
    )
    ap.add_argument("--min-pixels", type=int, default=64)
    ap.add_argument("--min-bpp", type=float, default=0.05)
    ap.add_argument("--min-caption-tokens", type=int, default=10)
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if not args.input and not args.synth:
        ap.error("one of --input / --synth is required")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = SparkSession.builder.appName("image-curate")
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()

    if args.synth:
        from web_crawler_search_engine_spark.sources.corpus import (
            corpus_df,
            generate_world,
        )

        world = generate_world(
            n=args.synth, hosts=4, seed=17, with_images=True
        )
        corpus = corpus_df(spark, world).filter(F.col("bytes").isNotNull())
    else:
        corpus = spark.read.parquet(args.input)

    result = curate(
        corpus,
        args.min_pixels,
        args.min_bpp,
        args.min_caption_tokens,
        args.max_hamming,
    ).persist()
    kept = result.filter("keep").drop("keep", "quality_keep", "survivor")
    dropped = result.filter("NOT keep").drop(
        "keep", "quality_keep", "survivor"
    )
    kept.write.mode("overwrite").parquet(f"{args.out}/kept.parquet")
    dropped.write.mode("overwrite").parquet(f"{args.out}/dropped.parquet")
    metrics = {
        "input": result.count(),
        "kept": kept.count(),
        "quality_dropped": result.filter("NOT quality_keep").count(),
        "neardup_dropped": result.filter(
            "quality_keep AND NOT coalesce(survivor, true)"
        ).count(),
        "out": args.out,
    }
    result.unpersist()
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
