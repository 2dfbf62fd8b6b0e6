import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from dgraph_spark import get_spark

    s = get_spark("dgraph-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def graph(spark):
    from dgraph_spark.sources import load_tpch_graph

    return load_tpch_graph(spark, SF_SMALL)


@pytest.fixture()
def executor(graph):
    from dgraph_spark.plans import Executor

    return Executor(graph)
