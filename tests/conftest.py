"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))  # for oracle_sim

from olx_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("olx_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def crawl_graph():
    from olx_spark.fixtures import make_crawl_graph

    return make_crawl_graph()


@pytest.fixture(scope="session")
def sim_results(crawl_graph):
    from oracle_sim import simulate_all

    return simulate_all(crawl_graph.store, crawl_graph.seeds)


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
