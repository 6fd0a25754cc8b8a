"""End-to-end training-set build (plans/training_set.py): raw
interleaved corpus → extract → reassemble → near-dedup → quality gate →
pack → audited WAP publish, each stage an already-oracled operator."""

from ocr_to_csv_spark.plans.training_set import build_training_set
from ocr_to_csv_spark.sources import SnapshotCatalog


def test_corpus_to_published_shards(spark, tmp_path):
    from ocr_to_csv_spark.datagen.gen import write_corpus

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, 24, seed=11)
    res = build_training_set(spark, corpus, str(tmp_path / "warehouse"))

    assert res["published"], res
    assert res["extracted_docs"] >= 24  # every doc produced text
    assert 0 < res["after_dedup_and_quality"] <= res["extracted_docs"]
    assert res["shard_rows"] == res["after_dedup_and_quality"]
    assert res["dup_fingerprints"] == 0 and res["empty_docs"] == 0

    cat = SnapshotCatalog(spark, str(tmp_path / "warehouse"))
    main = cat.read("training_shards")
    assert main.count() == res["shard_rows"]  # published to main
    cols = set(main.columns)
    assert {"doc_id", "n_tokens", "fp"} <= cols
    # packing invariants on the published table
    rows = main.collect()
    assert all(r["n_tokens"] > 0 for r in rows)
    assert len({r["fp"] for r in rows}) == len(rows)
