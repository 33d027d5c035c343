from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from ms_ocr_spark.session import get_spark

    s = get_spark(app="ms_ocr_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Small deterministic interleaved corpus shared by Spark tests."""
    from ms_ocr_spark.sources.datagen import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(out, n_docs=60, seed=42)
    return out


SF_DIR = "/root/testdata/sf0.001"
