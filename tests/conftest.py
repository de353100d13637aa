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
        # one JVM hosts driver AND executors for the whole session (~20k
        # stages across the engine e2e tests): give it headroom and make the
        # ContextCleaner sweep broadcast/shuffle state aggressively instead
        # of waiting for the default 30min tick
        .config("spark.driver.memory", "12g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        # the full suite once died with driver java.lang.OutOfMemoryError:
        # the app/SQL status stores retain up to 1000 executions / 1000
        # stages EACH HOLDING the physical-plan description string — and the
        # engine's per-batch plans are enormous (hundreds of nodes, several
        # MB of text after AQE re-plans). Keep only a small trailing window;
        # these stores feed the (disabled) UI and nothing in the tests.
        .config("spark.sql.ui.retainedExecutions", "20")
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "2000")
        .config("spark.sql.maxMetadataStringLength", "50")
        .getOrCreate()
    )
    yield spark
    spark.stop()
