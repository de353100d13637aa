"""gc_spark — a PySpark-native URL-frontier & fetch-scheduler engine.

Brand-new engine (NOT a port) with the data-processing capabilities of
``dod-advana/gamechanger-crawlers``: frontier tables, a distributed URL-seen
set (partitioned Bloom filter over canonicalized-URL xxhash64), per-host
politeness budgets drained in salted micro-batches, interleaved text+media
span documents, and checkpoint-resumable crawl runs — all expressed with the
DataFrame API + vectorized pandas/Arrow UDFs so Catalyst/Tungsten/AQE do the
physical planning.

Reference behavior studied from /root/reference (see SURVEY.md); citations in
docstrings use reference file:line so parity can be audited.
"""

__version__ = "0.1.0"
