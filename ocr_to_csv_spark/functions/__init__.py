"""Query library: SURVEY.md §2 relational operators plus the training-data
pipeline operators (dedup / similarity / text analysis) over the driver's
TPC-H-ish testdata. Every query here is paired with a DuckDB oracle SQL
string (same aliases, same arithmetic) consumed by ``__spark_entry__.py``."""

from . import dedup, relational, similarity, textops  # noqa: F401


def table(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
