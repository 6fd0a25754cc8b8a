"""HTML-extraction robustness: real-web malformations must produce
deterministic, reasonable output (never crash a 10^12-doc job)."""

from ocr_to_csv_spark.extraction.html_extract import parse_html


def test_entities_decoded():
    assert parse_html("<p>Tom &amp; Jerry &lt;3 &#65;</p>") == [
        ("text", "Tom & Jerry <3 A")
    ]


def test_unclosed_cells_and_rows_harvest():
    out = parse_html("<table><tr><td>a<td>b<tr><td>c</table>")
    assert out == [("table_row", ["a", "b"]), ("table_row", ["c"])]


def test_nested_table_rows_all_harvested():
    # nested tables flatten in source order: outer cell 'a', inner row
    # 'x', outer cell 'b' — deterministic, nothing dropped
    out = parse_html(
        "<table><tr><td>a<table><tr><td>x</td></tr></table></td>"
        "<td>b</td></tr></table>"
    )
    flat = [c for kind, cells in out for c in cells]
    assert sorted(flat) == ["a", "b", "x"]


def test_comments_and_script_content_ignored():
    assert parse_html(
        "<p>ok</p><!-- <table><tr><td>no</td></tr></table> -->"
    ) == [("text", "ok")]
    assert parse_html("<script>var t='<table>';</script><p>after</p>") == [
        ("text", "after")
    ]


def test_nested_boilerplate_subtree_removed():
    assert parse_html("<nav><div><p>menu</p></div></nav><p>real</p>") == [
        ("text", "real")
    ]


def test_empty_and_untagged_inputs():
    assert parse_html("") == []
    assert parse_html(None) == []
    assert parse_html("plain text only") == [("text", "plain text only")]


def test_header_rows_flagged():
    out = parse_html("<table><tr><th>H</th></tr><tr><td>v</td></tr></table>")
    assert out == [("header_row", ["H"]), ("table_row", ["v"])]


def test_colspan_expands_to_grid_slots():
    out = parse_html(
        "<table><tr><td colspan=2>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td><td>e</td></tr></table>"
    )
    assert out == [
        ("table_row", ["a", "a", "b"]),
        ("table_row", ["c", "d", "e"]),
    ]


def test_rowspan_carries_into_following_rows():
    out = parse_html(
        "<table><tr><td rowspan=2>a</td><td>b</td></tr>"
        "<tr><td>c</td></tr><tr><td>d</td><td>e</td></tr></table>"
    )
    assert out == [
        ("table_row", ["a", "b"]),
        ("table_row", ["a", "c"]),  # rowspan re-fills column 0
        ("table_row", ["d", "e"]),  # span exhausted
    ]


def test_rowspan_colspan_combined_and_trailing():
    # 2x2 block spanning both directions; second row has only one cell,
    # so the pending block pads its slots
    out = parse_html(
        "<table><tr><td colspan=2 rowspan=2>x</td><td>r1</td></tr>"
        "<tr><td>r2</td></tr></table>"
    )
    assert out == [
        ("table_row", ["x", "x", "r1"]),
        ("table_row", ["x", "x", "r2"]),
    ]


def test_hostile_span_values_clipped_or_defaulted():
    out = parse_html(
        "<table><tr><td colspan=999999999>a</td><td colspan=zzz>b</td></tr></table>"
    )
    row = out[0][1]
    assert len(row) == 257 and row[-1] == "b"  # clipped to 256, malformed -> 1


def test_rowspan_state_resets_between_tables():
    out = parse_html(
        "<table><tr><td rowspan=3>a</td></tr></table>"
        "<table><tr><td>b</td></tr></table>"
    )
    assert out == [("table_row", ["a"]), ("table_row", ["b"])]
