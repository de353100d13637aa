from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("gc_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # one JVM hosts driver AND executors for the whole session (~10k
        # stages across the engine e2e tests): give it headroom and make the
        # ContextCleaner sweep broadcast/shuffle state aggressively instead
        # of waiting for the default 30min tick
        .config("spark.driver.memory", "8g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .getOrCreate()
    )
    yield spark
    spark.stop()
