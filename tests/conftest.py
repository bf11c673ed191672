import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zombi_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("zombi-spark-tests")
    yield spark


@pytest.fixture(scope="module", autouse=True)
def _release_spark_session_state():
    """Free cached frames + checkpoint blocks between test FILES.

    The suite shares one SparkSession; persisted frames leaked by one
    module (session-cached dedup pipelines, plan caches, test-local
    persists) otherwise accumulate for the rest of the run, and every
    later plan pays CacheManager lookups against the growing cache list
    plus the memory pressure — measured: the same tests run ~2× slower
    late in the suite than in a fresh session (semantic_dedup_auto 57 s
    in-suite vs 25 s fresh). Clearing BETWEEN modules keeps within-file
    reuse (the load-bearing persists) intact; later modules that touch a
    session-memoized plan simply recompute it, which is correct and far
    cheaper than the drag."""
    yield
    import gc

    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        try:
            s.catalog.clearCache()
        except Exception:
            pass
    gc.collect()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def oracle_dir():
    return SF_ORACLE
