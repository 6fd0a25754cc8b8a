"""LaTeX extraction (corpus v10 format breadth): parser unit + noise
robustness + the datagen↔parser golden symmetry property. Golden-
equality e2e coverage rides the flagship suite (the corpus now
interleaves latex spans)."""

import random

from ocr_to_csv_spark.extraction.latex import parse_latex


def test_basic_document():
    tex = (
        "\\documentclass{article}\n"
        "\\usepackage{amsmath}\n"
        "% a comment line\n"
        "\\begin{document}\n"
        "\\maketitle\n"
        "\\section{Title here}\n"
        "\\label{sec:x}\n\n"
        "first \\textbf{bold} words $e=mc^2$ tail\n\n"
        "\\begin{tabular}{|l|l|}\n"
        "\\hline\n"
        "NAME & HOURS \\\\\n"
        "\\hline\n"
        "Alice & 3 \\\\\n"
        "Bob &  \\\\\n"
        "\\end{tabular}\n"
        "\\end{document}\n"
    )
    assert parse_latex(tex) == [
        ("text", "Title here"),
        ("text", "first bold words tail"),
        ("header_row", ["NAME", "HOURS"]),
        ("table_row", ["Alice", "3"]),
        ("table_row", ["Bob", ""]),
    ]


def test_escaped_percent_survives_comment_strip():
    assert parse_latex("a 5\\% rise % note\n") == [("text", "a 5% rise")]


def test_unclosed_tabular_drops_tail_without_error():
    tex = "keep this\n\\begin{tabular}{|l|}\nA & B \\\\\nnever closed"
    assert parse_latex(tex) == [("text", "keep this")]


def test_nested_wrap_and_unknown_commands():
    tex = "\\emph{\\textbf{deep}} word \\unknowncmd{arg} end\n"
    assert parse_latex(tex) == [("text", "deep word arg end")]


def test_item_markers_join_paragraph():
    tex = "\\item first thing\n\\item second thing\n"
    assert parse_latex(tex) == [("text", "first thing second thing")]


def test_empty_and_comment_only_documents():
    assert parse_latex("") == []
    assert parse_latex("% only a comment\n% another\n") == []


def test_golden_symmetry_property():
    """parse_latex(render(x)) == golden(x) across 200 random docs —
    the datagen and the parser implement the same contract."""
    from ocr_to_csv_spark.datagen.gen import _latex_doc

    for s in range(200):
        rng = random.Random(f"sym:{s}")
        tex, golden = _latex_doc(rng, rng.randint(0, 22))
        parsed = [
            (k, p) for k, p in parse_latex(tex) if k != "header_row"
        ]
        assert parsed == [
            (k, p if k == "text" else list(p)) for k, p in golden
        ], s
