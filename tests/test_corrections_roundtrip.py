"""Pipeline-level corrections round-trip (reference main.py:208-228):
extract with the bootstrap (empty-name) dictionary → every name cell
fails acceptance and lands in the review sink → offline confirmation →
``merge_aliases`` grows the dictionary → re-extract accepts the cells.

This is the cluster analogue of the reference's interactive loop on a
fresh install: ``aliases.json`` bootstraps empty (main.py:72-81), every
name returns ('NaN', 0, False) (corrections.py:296-304 with an empty
dictionary), the human supplies values, and the dictionary write-back
(main.py:219-228) makes the next run accept them. The GUI becomes a
review table plus a dictionary MERGE (SURVEY.md §2.11).
"""

from ocr_to_csv_spark.datagen.gen import HEADER, alias_purposes
from ocr_to_csv_spark.extraction import pipeline
from ocr_to_csv_spark.extraction.aliases import merge_aliases
from ocr_to_csv_spark.imaging import png, render

DOC_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
MEDIA_SCHEMA = "media_ref string, content binary, width int, height int"


def _fixture(spark):
    table = [HEADER] + [
        ["1", "QUINN ZEPHYR", "1:30", "2:45", "3", "ROBOTICS"],
        ["2", "JOHN SMITH", "9:05", "11:30", "2", "CODING"],
    ]
    page = render.render_page(table)
    docs = spark.createDataFrame(
        [("doc-rt", [{"kind": "image", "text": None, "media_ref": "m-rt",
                      "offset": 0}])],
        DOC_SCHEMA,
    )
    media = spark.createDataFrame(
        [("m-rt", png.encode_gray(page), 0, 0)], MEDIA_SCHEMA
    )
    # bootstrap state: purposes known, the name dictionary still empty
    aliases = spark.createDataFrame(
        [(5, v) for v in alias_purposes()], "col int, value string"
    )
    return docs, media, aliases


def test_review_confirm_merge_reextract(spark):
    docs, media, aliases = _fixture(spark)

    res1 = pipeline.extract(spark, docs, media, aliases)
    review1 = res1["review"].filter("col = 1").collect()
    # empty dictionary → both name cells unmatched and flagged for review
    assert sorted(r["row"] for r in review1) == [1, 2]
    # reference corrections.py:300 spells the sentinel 'Nan'
    assert all(r["text"] == "Nan" for r in review1)

    # offline confirmation (the human/model review step) → dictionary MERGE
    confirmed = spark.createDataFrame(
        [(1, "QUINN ZEPHYR"), (1, "JOHN SMITH")], "col int, value string"
    )
    grown = merge_aliases(aliases, confirmed)
    assert grown.filter("col = 1").count() == 2

    res2 = pipeline.extract(spark, docs, media, grown)
    assert res2["review"].filter("col = 1").count() == 0
    rows2 = {r["name"]: r for r in res2["rows"].collect()}
    assert set(rows2) == {"quinn zephyr", "john smith"}
    assert rows2["quinn zephyr"]["purpose"] == "robotics"
    assert rows2["john smith"]["time_in"] == "9:05"
