"""Markdown main-content extraction — the text-side format breadth
next to HTML (``html_extract.py``): GitHub-style pipe tables map to the
same (header_row, table_row) items the HTML <table> harvester emits,
and boilerplate (nav link lines, horizontal rules, code fences) is
stripped the way the HTML path strips <nav>/<script>/<style>.

Parity contract (mirrors ``parse_html``): returns ordered
[('text', str) | ('header_row', [cells]) | ('table_row', [cells])].

Rules (deterministic, shared with the datagen golden builder):
- ``` fences toggle code mode; fence lines and fenced lines drop.
- A run of ``|...|`` lines whose SECOND line is a ``---`` separator row
  is a table: first line → header_row, separator drops, rest →
  table_row (cells pipe-split and stripped). A pipe run without the
  separator is ordinary paragraph text.
- ``# heading`` (1-6 #) → its own text item, markers stripped.
- Horizontal rules and link-only nav lines drop (boilerplate).
- ``> `` blockquote markers strip; content joins the paragraph.
- Other contiguous non-blank lines join (space-separated) into one
  text item per blank-line-delimited paragraph.

Reference parity: the reference has no markdown input; this extends
S1 kind dispatch (``image_scraper.py:103-106``) the same way WARC /
JSONL extended the ingest edge.
"""

from __future__ import annotations

import re

_TABLE_LINE = re.compile(r"^\s*\|.*\|\s*$")
_SEP_CELL = re.compile(r"^:?-{3,}:?$")
_HEADING = re.compile(r"^(#{1,6})\s+(.*)$")
_HR = re.compile(r"^\s*(-{3,}|\*{3,}|_{3,})\s*$")
_NAV = re.compile(r"^\s*(\[[^\]]*\]\([^)]*\)\s*)+$")


def _cells(line: str) -> list[str]:
    inner = line.strip().strip("|")
    return [c.strip() for c in inner.split("|")]


def parse_markdown(text: str) -> list[tuple[str, object]]:
    """Parse one markdown document into ordered content items
    (module docstring contract)."""
    items: list[tuple[str, object]] = []
    para: list[str] = []
    lines = (text or "").split("\n")

    def flush() -> None:
        if para:
            items.append(("text", " ".join(para)))
            para.clear()

    i = 0
    in_code = False
    n = len(lines)
    while i < n:
        ln = lines[i]
        if ln.strip().startswith("```"):
            in_code = not in_code
            flush()
            i += 1
            continue
        if in_code:
            i += 1
            continue
        if _TABLE_LINE.match(ln):
            j = i
            block: list[list[str]] = []
            while j < n and _TABLE_LINE.match(lines[j]):
                block.append(_cells(lines[j]))
                j += 1
            is_table = (
                len(block) >= 2
                and block[1]
                and all(_SEP_CELL.match(c) for c in block[1])
            )
            if is_table:
                flush()
                items.append(("header_row", block[0]))
                for row in block[2:]:
                    items.append(("table_row", row))
            else:
                para.extend(lines[k].strip() for k in range(i, j))
            i = j
            continue
        if not ln.strip():
            flush()
            i += 1
            continue
        m = _HEADING.match(ln)
        if m:
            flush()
            items.append(("text", m.group(2).strip()))
            i += 1
            continue
        if _HR.match(ln) or _NAV.match(ln):
            flush()
            i += 1
            continue
        stripped = ln.strip()
        if stripped.startswith(">"):
            stripped = stripped.lstrip(">").strip()
            if not stripped:
                i += 1
                continue
        para.append(stripped)
        i += 1
    flush()
    return items
