from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from abstracts_search_spark.session import build_spark
from abstracts_search_spark.sources.transcripts import gen_transcripts


@pytest.fixture(scope="session")
def spark():
    s = build_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("transcripts") / "tiny")
    gen_transcripts(d, scale="tiny", seed=42)
    return d


@pytest.fixture(scope="session")
def small_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("transcripts") / "small")
    gen_transcripts(d, scale="small", seed=42)
    return d


@pytest.fixture(scope="session")
def tiny_df(spark, tiny_dir):
    from abstracts_search_spark.sources.transcripts import load_transcripts

    return load_transcripts(spark, tiny_dir).cache()


@pytest.fixture(scope="session")
def small_df(spark, small_dir):
    from abstracts_search_spark.sources.transcripts import load_transcripts

    return load_transcripts(spark, small_dir).cache()
