import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from abot_dotnet_core_spark.session import get_spark
    s = get_spark("abot-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus_dir(tmp_path_factory):
    """TINY synthetic corpus written once per session."""
    from abot_dotnet_core_spark.sources.corpus import TINY, write_parquet
    d = tmp_path_factory.mktemp("corpus_tiny")
    write_parquet(TINY, str(d))
    return str(d)
