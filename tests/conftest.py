import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plato_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark(
        app_name="plato_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


def edges_df(spark, edges, weights=None):
    """list[(src,dst)] (+ optional parallel weight list) -> DataFrame."""
    if weights is None:
        return spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], "src long, dst long"
        )
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for (a, b), w in zip(edges, weights)],
        "src long, dst long, weight double",
    )


def df_to_dict(df, key="id", val=None):
    rows = df.collect()
    if val is None:
        val = [c for c in df.columns if c != key][0]
    return {r[key]: r[val] for r in rows}
