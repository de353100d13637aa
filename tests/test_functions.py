"""Kernel unit tests: byte-exact parity with the reference string/hash/date
semantics, validated against the 63 golden hash pairs extracted from the
reference's committed us_code fixtures."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType

from gc_spark.functions.hashing import (
    dict_to_sha256_hex_digest,
    sha256_col,
    str_to_sha256_hex_digest,
    url_hash64,
    version_hash_udf,
)
from gc_spark.functions.text import ascii_clean, ascii_clean_udf, squash_spaces_col
from gc_spark.functions.urls import (
    canonicalize_url,
    canonicalize_url_udf,
    ensure_full_href_url,
    file_extension_col,
    file_extension_udf,
    filter_mailto,
    get_href_file_extension,
    is_valid_web_url,
    url_encode_spaces_col,
)
from gc_spark.functions.dates import get_pub_date, pub_date_udf

GOLDENS = json.loads((Path(__file__).parent / "resources" / "hash_goldens.json").read_text())


class TestVersionHash:
    def test_scalar_goldens(self):
        for p in GOLDENS:
            assert dict_to_sha256_hex_digest(p["raw_data"]) == p["expected_hash"], p["doc_name"]

    def test_udf_goldens(self, spark):
        schema = StructType(
            [
                StructField("raw_data", MapType(StringType(), StringType())),
                StructField("expected_hash", StringType()),
            ]
        )
        df = spark.createDataFrame(
            [(p["raw_data"], p["expected_hash"]) for p in GOLDENS], schema=schema
        )
        out = df.withColumn("h", version_hash_udf("raw_data"))
        bad = out.filter(F.col("h") != F.col("expected_hash")).count()
        assert bad == 0
        assert out.count() == 63

    def test_none_value_formatting(self, spark):
        # str(None) must serialize bare (no quotes) — MapType null value
        d = {"a": None, "b": "x"}
        expected = dict_to_sha256_hex_digest(d)
        df = spark.createDataFrame(
            [(d,)], schema=StructType([StructField("m", MapType(StringType(), StringType()))])
        )
        got = df.select(version_hash_udf("m").alias("h")).first()["h"]
        assert got == expected

    def test_str_sha256(self, spark):
        assert (
            str_to_sha256_hex_digest("abc")
            == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
        )
        got = (
            spark.createDataFrame([("abc",)], ["s"])
            .select(sha256_col(F.col("s")).alias("h"))
            .first()["h"]
        )
        assert got == str_to_sha256_hex_digest("abc")

    def test_url_hash64_deterministic(self, spark):
        df = spark.createDataFrame([("https://a.mil/x",)], ["u"])
        h1 = df.select(url_hash64(F.col("u")).alias("h")).first()["h"]
        h2 = df.select(url_hash64(F.col("u")).alias("h")).first()["h"]
        assert h1 == h2 and isinstance(h1, int)


class TestAsciiClean:
    CASES = [
        "Title 4 – Flag and Seal",  # en-dash dropped by ascii-ignore
        "a b",
        "it’s &#39;quoted&#39;",
        "  padded  ",
        "plain",
        "café olé",
        "&nbsp;lead",
    ]

    def test_scalar_matches_reference_formula(self):
        for c in self.CASES:
            expected = (
                c.replace(" ", " ")
                .replace("’", "'")
                .replace("&#39;", "'")
                .replace("&nbsp;", " ")
                .encode("ascii", "ignore")
                .decode("ascii")
                .strip()
            )
            assert ascii_clean(c) == expected

    def test_udf_matches_scalar(self, spark):
        df = spark.createDataFrame([(c,) for c in self.CASES], ["t"])
        rows = df.select("t", ascii_clean_udf("t").alias("c")).collect()
        for r in rows:
            assert r["c"] == ascii_clean(r["t"])


class TestUrls:
    def test_ensure_full_href(self):
        assert (
            ensure_full_href_url("/a/b.pdf", "https://x.mil/c/d") == "https://x.mil/a/b.pdf"
        )
        assert ensure_full_href_url("https://y.mil/z ", "https://x.mil") == "https://y.mil/z"

    def test_extension_scalar(self):
        assert get_href_file_extension("https://x.mil/a/b.PDF") == "pdf"
        assert get_href_file_extension("https://x.mil/a/b") == "UNKNOWN"
        assert get_href_file_extension("https://x.mil/a/.hidden") == "UNKNOWN"
        assert get_href_file_extension("https://x.mil/a/b.tar.gz") == "gz"
        assert get_href_file_extension("https://x.mil/a.b/c") == "UNKNOWN"

    def test_extension_udf_and_native_agree(self, spark):
        urls = [
            "https://x.mil/a/b.PDF",
            "https://x.mil/a/b",
            "https://x.mil/a/b.tar.gz",
            "https://x.mil/d.aspx?q=1",
            "https://x.mil/a.b/c",
        ]
        df = spark.createDataFrame([(u,) for u in urls], ["u"])
        rows = df.select(
            "u",
            file_extension_udf("u").alias("exact"),
            file_extension_col(F.col("u")).alias("native"),
        ).collect()
        for r in rows:
            assert r["exact"] == get_href_file_extension(r["u"])
            assert r["native"] == r["exact"], r["u"]

    def test_valid_url(self):
        assert is_valid_web_url("https://x.mil/a")
        assert not is_valid_web_url("ftp://x.mil/a")
        assert not is_valid_web_url("https://x .mil/a")
        assert not is_valid_web_url("not a url")

    def test_mailto_filter(self, spark):
        df = spark.createDataFrame(
            [("mailto:a@b.mil",), ("MAILTO:c@d.mil",), ("https://x.mil",)], ["href"]
        )
        out = [r["href"] for r in filter_mailto(df, "href").collect()]
        assert out == ["https://x.mil"]

    def test_encode_spaces_native(self, spark):
        df = spark.createDataFrame([("https://x.mil/a b c.pdf",)], ["u"])
        got = df.select(url_encode_spaces_col(F.col("u")).alias("e")).first()["e"]
        assert got == "https://x.mil/a%20b%20c.pdf"

    def test_canonicalize(self):
        # fragments are KEPT: SPA-route seeds differ only by fragment
        # (air_force_spider.py:40-51)
        assert canonicalize_url("HTTPS://X.MIL:443/A b#frag") == "https://x.mil/A%20b#frag"
        assert canonicalize_url("http://x.mil:80") == "http://x.mil/"
        assert canonicalize_url("https://x.mil/p?b=2&a=1") == "https://x.mil/p?b=2&a=1"
        assert (
            canonicalize_url("https://x.mil/Product-Index/#/?view=cat&catID=1")
            != canonicalize_url("https://x.mil/Product-Index/#/?view=cat&catID=2")
        )

    def test_canonicalize_udf_matches_scalar(self, spark):
        urls = ["HTTPS://X.MIL/A b", "http://y.mil:80/q?x=1#f", "https://z.mil"]
        df = spark.createDataFrame([(u,) for u in urls], ["u"])
        rows = df.select("u", canonicalize_url_udf("u").alias("c")).collect()
        for r in rows:
            assert r["c"] == canonicalize_url(r["u"])

    def test_canonicalize_native_col_parity(self, spark):
        """The fully-native (codegen) canonicalizer must byte-match the
        scalar on the valid ';'-free URL zoo (hot-path contract)."""
        import itertools

        from gc_spark.functions.urls import canonicalize_url_col

        schemes = ["http", "https", "HTTP"]
        hosts = ["X.MIL", "a-b.gov", "h.mil:8080", "h.mil:80", "h.mil:443"]
        paths = ["", "/", "/a/b.PDF", "/a b/c", "/q"]
        tails = ["", "?a=1&b=2", "?", "#frag", "?x#y", "#/?view=1", "?#z", ".pdf"]
        urls = [
            f"{s}://{h}{p}{t}"
            for s, h, p, t in itertools.product(schemes, hosts, paths, tails)
            if is_valid_web_url(f"{s}://{h}{p}{t}") and ";" not in f"{s}://{h}{p}{t}"
        ]
        df = spark.createDataFrame([(u,) for u in urls], ["u"]).select(
            "u", canonicalize_url_col(F.col("u")).alias("c")
        )
        bad = [r for r in df.collect() if r["c"] != canonicalize_url(r["u"])]
        assert not bad, bad[:5]

    def test_canonicalize_fast_path_property(self, spark):
        """The vectorized fast path must agree with the scalar on a broad URL
        zoo (incl. fast-path hits and fallback rows)."""
        from hypothesis import given, settings, strategies as st

        host = st.from_regex(r"[a-zA-Z0-9.-]{1,20}\.(mil|gov|com)", fullmatch=True)
        path = st.from_regex(r"(/[a-zA-Z0-9._ %-]{0,12}){0,3}", fullmatch=True)
        query = st.one_of(st.just(""), st.from_regex(r"\?[a-z0-9=&]{0,10}", fullmatch=True))
        frag = st.one_of(st.just(""), st.from_regex(r"#[a-z0-9/?=&]{0,10}", fullmatch=True))
        scheme = st.sampled_from(["http", "https", "HTTP", "Https"])
        port = st.sampled_from(["", ":80", ":443", ":8080"])
        urls = st.builds(
            lambda s, h, p, pa, q, f: f"{s}://{h}{p}{pa}{q}{f}", scheme, host, port, path, query, frag
        )

        @settings(max_examples=200, deadline=None)
        @given(st.lists(urls, min_size=1, max_size=50))
        def check(batch):
            import pandas as pd

            from gc_spark.functions import urls as U

            got = U.canonicalize_url_udf.func(pd.Series(batch))
            for u, g in zip(batch, got):
                assert g == canonicalize_url(u), u

        check()


class TestDates:
    def test_pub_date_scalar(self):
        assert get_pub_date("20 May 2022") == "2022-05-20T00:00:00"
        assert get_pub_date("2022-05-20") == "2022-05-20T00:00:00"
        # unparseable values pass through unchanged (reference get_pub_date)
        assert get_pub_date("N/A") == "N/A"

    def test_pub_date_udf(self, spark):
        df = spark.createDataFrame(
            [("2022-05-20",), ("05/20/2022",), ("N/A",), (None,)], ["d"]
        )
        rows = {r["d"]: r["p"] for r in df.select("d", pub_date_udf("d").alias("p")).collect()}
        assert rows["2022-05-20"] == "2022-05-20T00:00:00"
        assert rows["05/20/2022"] == "2022-05-20T00:00:00"
        assert rows["N/A"] == "N/A"
        assert rows[None] is None


class TestSquashSpaces:
    def test_native(self, spark):
        df = spark.createDataFrame([("a \n\t b   c",)], ["t"])
        got = df.select(squash_spaces_col(F.col("t")).alias("s")).first()["s"]
        import re

        assert got == re.sub(r"\s*[\n\t\r\s+]\s*", " ", "a \n\t b   c")


class TestTrainingDataKernels:
    def test_rolling_hash_matches_python_twin(self, spark):
        from gc_spark.functions.text import (
            ROLLING_BASE,
            ROLLING_MOD,
            rolling_hash_col,
        )
        from pyspark.sql import functions as F

        texts = ["hello, world! it's 42", "", "a", "x  y\tz", "A" * 500]

        def twin(s: str) -> int:
            h = 0
            for c in s:
                h = (h * ROLLING_BASE + ord(c)) % ROLLING_MOD
            return h

        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
        got = {
            r["i"]: r["rh"]
            for r in df.select("i", rolling_hash_col(F.col("t")).alias("rh")).collect()
        }
        assert got == {i: twin(t) for i, t in enumerate(texts)}

    def test_bpe_ish_tokens(self, spark):
        from gc_spark.functions.text import bpe_ish_tokens_col
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, "hello, world! it's 42"), (2, ""), (3, "a+b=c_3")], "i long, t string"
        )
        got = {
            r["i"]: r["toks"]
            for r in df.select("i", bpe_ish_tokens_col(F.col("t")).alias("toks")).collect()
        }
        assert got[1] == ["hello", ",", "world", "!", "it", "'", "s", "42"]
        assert got[2] == []
        assert got[3] == ["a", "+", "b", "=", "c_3"]
