from __future__ import annotations

import shutil

import pytest

from twawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def crawl_root(spark, tmp_path_factory):
    """Small crawl-engine inputs shared by the round/resume tests."""
    from twawler_spark import synth

    root = str(tmp_path_factory.mktemp("crawl"))
    shutil.rmtree(root, ignore_errors=True)
    synth.write_inputs(spark, root, n_urls=3000, n_hosts=40, partitions=8)
    return root


N_HOSTS = 40
