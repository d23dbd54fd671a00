"""Shared fixtures: corpus paths, reference-SDK oracle import, Spark session."""

from __future__ import annotations

import json
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")
TEST_ASSETS = REFERENCE / "test-assets"
REF_PY_SRC = REFERENCE / "python" / "src"

sys.path.insert(0, str(REPO))


def load_json(path: pathlib.Path):
    return json.loads(path.read_text())


def corpus_available() -> bool:
    return TEST_ASSETS.exists()


def reference_sdk_available() -> bool:
    return (REF_PY_SRC / "json_structure").exists()


@pytest.fixture(scope="session")
def ref_sdk():
    """The reference Python SDK, used as a differential oracle only."""
    if not reference_sdk_available():
        pytest.skip("reference SDK not available")
    sys.path.insert(0, str(REF_PY_SRC))
    import json_structure  # noqa: F401
    return json_structure


@pytest.fixture(scope="session")
def spark():
    import os

    from pyspark.sql import SparkSession

    # executors' Python workers must be able to import sdk_spark
    os.environ["PYTHONPATH"] = f"{REPO}:{os.environ.get('PYTHONPATH', '')}"

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("sdk_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
