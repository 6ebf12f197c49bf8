import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kolibrie_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture()
def engine(spark):
    from kolibrie_spark import SparqlEngine

    return SparqlEngine(spark)


def rows(df):
    """Collected rows as sorted list of tuples of strings (order-insensitive)."""
    return sorted(
        tuple("" if v is None else str(v) for v in r) for r in df.collect()
    )
