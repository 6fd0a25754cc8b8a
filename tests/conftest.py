import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")


@pytest.fixture(scope="session")
def spark():
    from ocr_to_csv_spark.session import get_spark

    s = get_spark(
        "tests",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    from ocr_to_csv_spark.datagen.gen import write_corpus

    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), 40, seed=42)
    return str(d)
