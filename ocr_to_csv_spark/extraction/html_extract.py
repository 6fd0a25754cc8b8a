"""HTML main-content extraction: boilerplate strip + <table> harvest.

The HTML analogue of the reference's image pipeline (north_star): nav /
header / footer / script / style subtrees are boilerplate (the reference's
date-box fill filter F2 plays this role for images, reference
modules/image_scraper.py:148-157); <table> structure is harvested
row-major exactly like the cell-matrix slicing (reference
modules/image_scraper.py:292-300); remaining visible text becomes content
spans. Pure stdlib ``html.parser`` — runs vectorized inside pandas UDF
batches.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

BOILERPLATE_TAGS = frozenset(
    {"script", "style", "nav", "header", "footer", "aside", "head", "form", "noscript"}
)
_WS = re.compile(r"\s+")


def _clean(text: str) -> str:
    return _WS.sub(" ", text).strip()


class _Harvester(HTMLParser):
    """Single-pass DOM walk collecting ordered content blocks.

    Emits ('text', blob) for visible non-table text and
    ('table_row', [cells...]) for each <tr>, in source order.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.items: list[tuple[str, object]] = []
        self._boiler_depth = 0
        self._table_depth = 0
        self._row: list[str] | None = None
        self._cell: list[str] | None = None
        self._text_buf: list[str] = []
        self._row_is_header = False

    # -- text block helpers -------------------------------------------------
    def _flush_text(self) -> None:
        blob = _clean("".join(self._text_buf))
        self._text_buf = []
        if blob:
            self.items.append(("text", blob))

    # -- tag events ---------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in BOILERPLATE_TAGS:
            self._boiler_depth += 1
            return
        if self._boiler_depth:
            return
        if tag == "table":
            self._flush_text()
            self._table_depth += 1
        elif self._table_depth:
            # HTML5 implied end tags: a new tr/td/th closes any open cell/row
            if tag == "tr":
                self._implied_close_cell()
                self._implied_close_row()
                self._row = []
                self._row_is_header = False
            elif tag in ("td", "th"):
                self._implied_close_cell()
                if self._row is None:
                    self._row = []
                self._cell = []
                if tag == "th":
                    self._row_is_header = True
        elif tag in ("p", "div", "br", "li", "h1", "h2", "h3", "h4", "tr"):
            self._flush_text()

    def _implied_close_cell(self) -> None:
        if self._cell is not None:
            cell = _clean("".join(self._cell))
            if self._row is not None:
                self._row.append(cell)
            self._cell = None

    def _implied_close_row(self) -> None:
        if self._row is not None:
            self.items.append(
                ("header_row" if self._row_is_header else "table_row", self._row)
            )
            self._row = None

    def handle_endtag(self, tag):
        if tag in BOILERPLATE_TAGS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
            return
        if self._boiler_depth:
            return
        if tag == "table":
            self._implied_close_cell()
            self._implied_close_row()
            self._table_depth = max(0, self._table_depth - 1)
        elif self._table_depth:
            if tag in ("td", "th") and self._cell is not None:
                cell = _clean("".join(self._cell))
                if self._row is not None:
                    self._row.append(cell)
                self._cell = None
            elif tag == "tr" and self._row is not None:
                self.items.append(
                    ("header_row" if self._row_is_header else "table_row", self._row)
                )
                self._row = None
        elif tag in ("p", "div", "li", "h1", "h2", "h3", "h4"):
            self._flush_text()

    def handle_data(self, data):
        if self._boiler_depth:
            return
        if self._cell is not None:
            self._cell.append(data)
        elif self._table_depth:
            pass  # inter-cell whitespace inside tables
        else:
            self._text_buf.append(data)

    def close(self):
        super().close()
        self._flush_text()


def parse_html(html: str) -> list[tuple[str, object]]:
    """Parse one HTML document into ordered content items.

    Returns [('text', str) | ('header_row', [cells]) | ('table_row', [cells])]
    with boilerplate subtrees removed.
    """
    h = _Harvester()
    h.feed(html or "")
    h.close()
    return h.items
