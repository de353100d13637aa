"""Version-hash parity against the reference's committed per-spider output
samples (dataPipelines/gc_scrapy/gc_scrapy/output_samples/*.json — fixture
DATA shipped with the reference, same provenance as the us_code goldens).

Each record pairs a real crawl's version_hash_raw_data dict with the
version_hash the reference recorded for it; dict_to_sha256_hex_digest must
reproduce every one byte-for-byte. 155 records across 31 spiders — values
include None, bools, ints, URL-encoded strings, and non-ascii titles, so
this pins the fold's str() semantics far beyond the 63 us_code goldens.

Two sample files (navy_personnel_messages, secnav) are excluded at fixture
build time: their recorded hashes do not match their OWN recorded raw dicts
under the reference's hash fn either — stale samples from an older spider
revision (pre-rename raw-data fields), not a kernel divergence."""

from __future__ import annotations

import json
from pathlib import Path

from gc_spark.functions.hashing import dict_to_sha256_hex_digest

GOLDENS = json.loads(
    (Path(__file__).parent / "resources" / "sample_hash_goldens.json").read_text()
)


def test_sample_corpus_shape():
    assert len(GOLDENS) == 155
    assert len({g["spider"] for g in GOLDENS}) == 31


def test_every_sample_hash_reproduces():
    bad = [
        g["spider"]
        for g in GOLDENS
        if dict_to_sha256_hex_digest(g["version_hash_raw_data"]) != g["version_hash"]
    ]
    assert bad == []


def test_vectorized_udf_agrees_on_samples(spark):
    """The Arrow UDF path must agree with the scalar fold on the same real
    dicts (string-valued map cells — Spark maps are typed, so non-string
    sample values are stringified the way MapType delivery would)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import MapType, StringType

    rows = [
        (
            {k: (str(v) if v is not None and not isinstance(v, str) else v)
             for k, v in g["version_hash_raw_data"].items()},
            dict_to_sha256_hex_digest(
                {k: (str(v) if v is not None and not isinstance(v, str) else v)
                 for k, v in g["version_hash_raw_data"].items()}
            ),
        )
        for g in GOLDENS
    ]
    from gc_spark.functions.hashing import version_hash_udf

    df = spark.createDataFrame(rows, ["raw", "expected"])
    out = df.withColumn("got", version_hash_udf("raw"))
    assert out.filter(F.col("got") != F.col("expected")).count() == 0
