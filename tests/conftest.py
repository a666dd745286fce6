"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basic_data_pipeline_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # 12g driver: the suite runs ~30 full corpus-prep pipelines in ONE
    # JVM, and each leaves its result frames' localCheckpoint blocks
    # alive until GC — 8g OOM'd at the tail of whole-suite runs (the
    # per-test System.gc() in test_pipeline.py reclaims most of it;
    # the extra headroom covers what a live result still pins).
    s = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "12g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
