from __future__ import annotations

import tempfile

import pytest

from ontology_pipeline_spark.session import get_spark
from ontology_pipeline_spark.synth import generate_corpus


@pytest.fixture(scope="session")
def spark():
    # warehouse in a temp dir: the bucketed-table tests use saveAsTable,
    # which would otherwise create ./spark-warehouse inside the repo
    import shutil

    wh = tempfile.mkdtemp(prefix="spark-warehouse-")
    s = get_spark(
        master="local[4]",
        app_name="ops-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()
    shutil.rmtree(wh, ignore_errors=True)


@pytest.fixture(scope="session")
def corpus():
    return generate_corpus(n_pages=120, seed=42)


@pytest.fixture(scope="session")
def pages(spark, corpus):
    from ontology_pipeline_spark.synth import pages_df

    return pages_df(spark, corpus).cache()
