"""Unit tests for robots Crawl-delay parsing and delay-derived budgets."""

from __future__ import annotations

from gc_spark.operators.robots import budgets_from_crawl_delay, parse_crawl_delay


def _delays(spark, body, agent="*"):
    df = spark.createDataFrame([("h.mil", body)], ["host", "body"])
    return parse_crawl_delay(df, agent=agent).first()["crawl_delay"]


class TestParseCrawlDelay:
    def test_active_group_delay(self, spark):
        assert _delays(spark, "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n") == 2.5

    def test_wrong_agent_ignored(self, spark):
        body = "User-agent: badbot\nCrawl-delay: 99\nUser-agent: *\nDisallow: /\n"
        assert _delays(spark, body) is None

    def test_first_declaration_wins(self, spark):
        body = (
            "User-agent: *\nCrawl-delay: 3\n"
            "User-agent: *\nCrawl-delay: 30\n"
        )
        assert _delays(spark, body) == 3.0

    def test_named_agent_matches_star_and_self(self, spark):
        body = "User-agent: gcbot\nCrawl-delay: 7\n"
        assert _delays(spark, body, agent="gcbot") == 7.0
        assert _delays(spark, body, agent="*") is None

    def test_delay_outside_any_group_ignored(self, spark):
        assert _delays(spark, "Crawl-delay: 5\nUser-agent: *\nDisallow: /\n") is None


class TestBudgets:
    def test_floor_default_cap(self, spark):
        df = spark.createDataFrame(
            [("slow.mil", 30.0), ("fast.mil", 0.01), ("none.mil", None)],
            ["host", "crawl_delay"],
        )
        out = {
            r["host"]: r["budget_per_batch"]
            for r in budgets_from_crawl_delay(
                df, batch_seconds=60.0, default_delay=1.0, max_budget=100
            ).collect()
        }
        assert out == {"slow.mil": 2, "fast.mil": 100, "none.mil": 60}

    def test_huge_delay_floors_to_one(self, spark):
        df = spark.createDataFrame([("h.mil", 3600.0)], ["host", "crawl_delay"])
        assert budgets_from_crawl_delay(df).first()["budget_per_batch"] == 1
