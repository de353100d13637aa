"""Round-5 hardening: fan-out and collision fixes flagged by review.

- robots_diff_impact: duplicate (host, path) frontier rows must count once,
  not quadratically (the old two-verdict self-join fanned them out).
- cms_estimate: duplicate probe rows stay distinct rows in the output, and
  probe frames already carrying row/bucket/cnt columns don't collide with
  the sketch's internals.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class TestRobotsDiffNoFanout:
    def _rules(self, spark, rows):
        return spark.createDataFrame(rows, "host string, rule_type string, pattern string")

    def test_duplicate_urls_count_once(self, spark):
        from gc_spark.operators.robots import robots_diff_impact

        # the same URL discovered 3x — n_urls must see 3 rows, not 9
        urls = spark.createDataFrame(
            [("h", "/a")] * 3 + [("h", "/blocked")],
            "host string, path string",
        )
        old = self._rules(spark, [("h", "disallow", "/blocked")])
        new = self._rules(
            spark, [("h", "disallow", "/blocked"), ("h", "disallow", "/a")]
        )
        got = robots_diff_impact(urls, old, new).collect()
        assert len(got) == 1
        r = got[0]
        assert r["n_urls"] == 4
        assert r["newly_blocked"] == 3   # the 3 copies of /a
        assert r["unchanged_blocked"] == 1

    def test_diff_classes_unchanged_on_unique_urls(self, spark):
        from gc_spark.operators.robots import robots_diff_impact

        urls = spark.createDataFrame(
            [("h", "/a"), ("h", "/b"), ("h", "/c")],
            "host string, path string",
        )
        old = self._rules(spark, [("h", "disallow", "/a"), ("h", "disallow", "/b")])
        new = self._rules(spark, [("h", "disallow", "/b"), ("h", "disallow", "/c")])
        r = robots_diff_impact(urls, old, new).collect()[0]
        assert (
            r["newly_allowed"],
            r["newly_blocked"],
            r["unchanged_blocked"],
            r["unchanged_allowed"],
        ) == (1, 1, 1, 0)


class TestCmsEstimateRowIdentity:
    def test_duplicate_probe_rows_stay_distinct(self, spark):
        from gc_spark.operators.cms import cms_build, cms_estimate

        data = spark.createDataFrame(
            [("x",)] * 5 + [("y",)] * 2, "term string"
        )
        sketch = cms_build(data, term_col="term", depth=4, width=64)
        probes = spark.createDataFrame(
            [("x",), ("x",), ("y",)], "term string"
        )
        got = cms_estimate(sketch, probes, depth=4, width=64).collect()
        assert len(got) == 3  # row count in == row count out
        est = sorted((r["term"], r["cms_est"]) for r in got)
        assert est[0][1] == est[1][1] == 5  # both x copies estimate >= truth
        assert est[2][1] == 2

    def test_probe_frame_with_sketch_column_names(self, spark):
        from gc_spark.operators.cms import cms_build, cms_estimate

        data = spark.createDataFrame([("x",)] * 3, "term string")
        sketch = cms_build(data, term_col="term", depth=4, width=64)
        # probe frame already has row/bucket/cnt columns — must not collide
        probes = spark.createDataFrame(
            [("x", 1, 2, 3)], "term string, row int, bucket int, cnt int"
        )
        got = cms_estimate(sketch, probes, depth=4, width=64).collect()
        assert len(got) == 1
        r = got[0]
        assert r["cms_est"] == 3
        assert (r["row"], r["bucket"], r["cnt"]) == (1, 2, 3)  # passthrough
