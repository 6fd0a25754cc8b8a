"""Markdown extraction (corpus v9 format breadth): parser unit + noise
robustness. Golden-equality coverage rides the e2e suite (the corpus
now interleaves markdown spans)."""

from ocr_to_csv_spark.extraction.markdown import parse_markdown


def test_basic_document():
    md = (
        "# Title here\n\n"
        "[home](/h) [about](/a)\n\n"
        "first paragraph words\n\n"
        "| NAME | HOURS |\n|---|---|\n| Alice | 3 |\n| Bob |  |\n\n"
        "---\n"
    )
    items = parse_markdown(md)
    assert items == [
        ("text", "Title here"),
        ("text", "first paragraph words"),
        ("header_row", ["NAME", "HOURS"]),
        ("table_row", ["Alice", "3"]),
        ("table_row", ["Bob", ""]),
    ]


def test_pipe_run_without_separator_is_prose():
    md = "| not | a | table |\n| just | pipes | here |\n"
    items = parse_markdown(md)
    assert items == [("text", "| not | a | table | | just | pipes | here |")]


def test_unclosed_fence_drops_tail_without_error():
    md = "keep this\n\n```\nhidden = 1\nstill hidden"
    assert parse_markdown(md) == [("text", "keep this")]


def test_blockquote_and_multiline_paragraph():
    md = "> quoted words\ncontinuation line\n\nnext para\n"
    assert parse_markdown(md) == [
        ("text", "quoted words continuation line"),
        ("text", "next para"),
    ]


def test_empty_and_boilerplate_only():
    assert parse_markdown("") == []
    assert parse_markdown(None) == []
    assert parse_markdown("---\n***\n[x](/y)\n") == []


def test_table_at_eof_and_blank_cells():
    items = parse_markdown("| A | B |\n|---|---|\n|  |  |")
    assert items == [("header_row", ["A", "B"]), ("table_row", ["", ""])]


def test_markdown_kind_flows_through_pipeline(spark, tmp_path):
    """A planted markdown doc produces ordered text + table_row spans
    and CSV rows through the full extract path; unknown kinds still
    quarantine."""
    from ocr_to_csv_spark.extraction import pipeline

    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    {"kind": "markdown",
                     "text": "# H\n\npara one\n\n| NAME | TIME IN | TIME OUT "
                             "| HOURS | PURPOSE |\n|---|---|---|---|---|\n"
                             "| Alice Smith | 3:15 | 4:20 | 1 | ART |\n",
                     "media_ref": None, "offset": 0},
                    {"kind": "audio", "text": None, "media_ref": "m-x",
                     "offset": 1},
                ],
            )
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    media = spark.createDataFrame(
        [], "media_ref string, content binary"
    )
    aliases = spark.createDataFrame(
        [("1", "alice smith"), ("5", "art")], "col string, value string"
    )
    res = pipeline.extract(spark, docs, media, aliases)
    spans = sorted(
        ((r.kind, r.text, r.order) for r in res["spans"].collect()),
        key=lambda x: x[2],
    )
    assert spans == [
        ("text", "H", 0),
        ("text", "para one", 1),
        ("table_row", "Alice Smith,3:15,4:20,1,ART", 2),
    ]
    rows = res["rows"].collect()
    assert len(rows) == 1 and rows[0].name == "Alice Smith"
    q = res["quarantine"].collect()
    assert len(q) == 1 and q[0].kind == "audio"
