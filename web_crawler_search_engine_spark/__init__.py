"""PySpark-native rebuild of KevinPNguy01/Web-Crawler-Search-Engine.

A from-scratch analytics engine with the reference's capabilities —
URL-frontier crawl scheduling (BFS with per-host politeness, robots,
URL-seen dedup), inverted indexing with tf-idf, and top-k search —
re-expressed as declarative DataFrame programs over fixed-schema
tables, plus the large-scale training-data operators (dedup families,
similarity search, text analysis, multimodal columns) a 100 TB
pipeline needs.

Design principles (see SURVEY.md §7.0):
  * DataFrame/SQL first; Catalyst plans the physical strategy.
  * Vectorized pandas/Arrow UDFs only where stdlib-parity semantics
    demand Python (HTML parse, robots.txt eval, Porter stem, image
    decode); never per-row Python UDFs.
  * Determinism everywhere: no wall clock in parity paths, no
    monotonically_increasing_id; sequence assignment via row_number
    over explicit sort keys.
  * Scale-aware: broadcast small dims, pre-partition the frontier by
    host bucket, Bloom pre-filter for the seen set, salting for
    hot-host skew, AQE on.
"""

__version__ = "0.1.0"
