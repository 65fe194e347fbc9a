"""bench.py image_rehearsal mode: the synthesized corpus has the
claimed dup structure (exact dups + bounded-hamming near-dups), so the
benched operators measure real work — and the phase counts are the
closed-form cluster math, not coincidences of one seed."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from bench import synth_image_corpus  # noqa: E402


def test_synth_image_corpus_dup_structure(spark):
    n = 4000  # 1000 clusters of 4 copies
    rows = synth_image_corpus(spark, n).collect()
    assert len(rows) == n
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["image_id"] % (n // 4), []).append(r)
    assert len(by_cluster) == n // 4
    for members in by_cluster.values():
        ph = {r["image_id"] // (n // 4): r["phash"] for r in members}
        assert ph[0] == ph[1]  # copy 1 is an exact dup
        for a in range(4):
            for b in range(a + 1, 4):
                h = bin(
                    (ph[a] % (1 << 64)) ^ (ph[b] % (1 << 64))
                ).count("1")
                assert h <= 3, (a, b, h)
    # captions are distinct per copy (the carry rollup aggregates them)
    assert len({r["caption"] for r in rows}) == n


def test_bench_image_rehearsal_counts(spark):
    from bench import bench_image_rehearsal

    out = bench_image_rehearsal(spark, 4000, cpus=4)
    assert out["kept"] == 3000  # orig + 1-bit + 2-bit copies survive
    assert out["neardup_pairs"] == 6000  # 6 pairs per 4-copy cluster
    assert out["images_per_sec"] > 0
