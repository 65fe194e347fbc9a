"""jobs/curate_job.py end-to-end on the seeded corpus: the CLI writes
kept/dropped parquet whose partition is exactly the quality ∧
cluster-survivor decision recomputed from ground truth."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def _ground_truth(min_pixels=64, min_bpp=0.05, min_caption_tokens=10):
    from web_crawler_search_engine_spark.sources.corpus import generate_world

    world = generate_world(n=60, hosts=4, seed=17, with_images=True)
    rows = [r for r in world.rows if r["bytes"] is not None]
    # near-dup clusters over hamming<=3 (brute force union-find)
    parent = {r["image_id"]: r["image_id"] for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            h = bin(
                (a["phash"] % (1 << 64)) ^ (b["phash"] % (1 << 64))
            ).count("1")
            if h <= 3:
                ra, rb = find(a["image_id"]), find(b["image_id"])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    keep = {}
    for r in rows:
        quality = (
            r["w"] * r["h"] >= min_pixels
            and len(r["bytes"]) / (r["w"] * r["h"]) >= min_bpp
            and len(r["caption"].split()) >= min_caption_tokens
        )
        survivor = find(r["image_id"]) == r["image_id"]
        keep[r["image_id"]] = quality and survivor
    return keep


def test_curate_job_cli(spark, tmp_path, monkeypatch, capsys):
    from jobs import curate_job

    out = tmp_path / "curated"
    monkeypatch.setattr(
        sys,
        "argv",
        ["curate_job.py", "--synth", "60", "--out", str(out)],
    )
    curate_job.main()
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    want = _ground_truth()
    kept = {
        r["image_id"]
        for r in spark.read.parquet(f"{out}/kept.parquet").collect()
    }
    dropped = {
        r["image_id"]
        for r in spark.read.parquet(f"{out}/dropped.parquet").collect()
    }
    assert kept == {i for i, k in want.items() if k}
    assert dropped == {i for i, k in want.items() if not k}
    assert metrics["input"] == len(want)
    assert metrics["kept"] == len(kept)
    assert 0 < len(kept) < len(want)  # the funnel actually discriminates


def test_curate_job_cli_input_parquet(spark, tmp_path, monkeypatch, capsys):
    """The production path: --input reads an existing corpus parquet
    and produces the same decision as --synth on the same rows."""
    from pyspark.sql import functions as F

    from jobs import curate_job
    from web_crawler_search_engine_spark.sources.corpus import (
        corpus_df,
        generate_world,
    )

    world = generate_world(n=60, hosts=4, seed=17, with_images=True)
    src = str(tmp_path / "corpus.parquet")
    corpus_df(spark, world).filter(F.col("bytes").isNotNull()).write.parquet(
        src
    )
    out = tmp_path / "curated2"
    monkeypatch.setattr(
        sys, "argv", ["curate_job.py", "--input", src, "--out", str(out)]
    )
    curate_job.main()
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = {
        r["image_id"]
        for r in spark.read.parquet(f"{out}/kept.parquet").collect()
    }
    want = _ground_truth()
    assert kept == {i for i, k in want.items() if k}
