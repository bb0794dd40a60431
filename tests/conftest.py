"""Shared Spark session + pipeline fixtures (one JVM for the whole run)."""

from __future__ import annotations

import pytest

from osm_jigsaw_spark.fixtures.osm_world import (
    build_world,
    documents_df,
    query_points_df,
)
from osm_jigsaw_spark.plans.pipeline import run_pipeline
from osm_jigsaw_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="osm-jigsaw-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def world():
    return build_world()


@pytest.fixture(scope="session")
def docs(spark, world):
    return documents_df(spark, world).localCheckpoint()


@pytest.fixture(scope="session")
def pipeline(spark, docs):
    r = run_pipeline(docs)
    r.areas = r.areas.localCheckpoint()
    r.graph_edges = r.graph_edges.localCheckpoint()
    return r


@pytest.fixture(scope="session")
def qpoints(spark, world):
    return query_points_df(spark, world)
