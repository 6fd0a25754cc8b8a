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


_MAX_SPAN = 256  # clip hostile colspan/rowspan (real tables are far smaller)


def _spans(attrs: list[tuple[str, str | None]]) -> tuple[int, int]:
    """(colspan, rowspan) from a td/th attr list; malformed values → 1,
    clipped to [1, _MAX_SPAN] so a colspan=10^9 can't blow up a task."""
    cs = rs = 1
    for name, val in attrs:
        if name in ("colspan", "rowspan") and val:
            try:
                n = int(val.strip())
            except ValueError:
                continue
            n = max(1, min(n, _MAX_SPAN))
            if name == "colspan":
                cs = n
            else:
                rs = n
    return cs, rs


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
        self._row: list[tuple[str, int, int]] | None = None
        self._cell: list[str] | None = None
        self._cell_span: tuple[int, int] = (1, 1)
        self._rowspans: dict[int, list] = {}  # start col -> [text, rows_left, ncols]
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
            if self._table_depth == 0:
                self._rowspans = {}
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
                self._cell_span = _spans(attrs)
                if tag == "th":
                    self._row_is_header = True
        elif tag in ("p", "div", "br", "li", "h1", "h2", "h3", "h4", "tr"):
            self._flush_text()

    def _implied_close_cell(self) -> None:
        if self._cell is not None:
            cell = _clean("".join(self._cell))
            if self._row is not None:
                cs, rs = self._cell_span
                self._row.append((cell, cs, rs))
            self._cell = None

    def _layout_row(self, parsed: list[tuple[str, int, int]]) -> list[str]:
        """Normalize one parsed row to a flat cell list: a colspan=c cell
        fills c consecutive slots, a rowspan=r cell re-fills its column
        slots in the next r-1 rows (simplified HTML5 table grid algorithm
        — spans are assumed non-interleaving, as in real tables; hostile
        values are clipped by _spans so a 10^9 span can't OOM a task)."""
        out: list[str] = []
        col = 0
        new_this_row: set[int] = set()
        for text, cs, rs in parsed:
            while col in self._rowspans:
                ptext, _left, ncols = self._rowspans[col]
                out.extend([ptext] * ncols)
                col += ncols
            out.extend([text] * cs)
            if rs > 1:
                self._rowspans[col] = [text, rs - 1, cs]
                new_this_row.add(col)
            col += cs
        while True:
            nxt = min((c for c in self._rowspans if c >= col), default=None)
            if nxt is None:
                break
            ptext, _left, ncols = self._rowspans[nxt]
            if nxt not in new_this_row:
                out.extend([""] * (nxt - col))
                out.extend([ptext] * ncols)
            col = nxt + ncols
        # a span created in THIS row still owes all its rows_left
        # carry-rows; only spans applied this row are decremented
        for c in list(self._rowspans):
            if c in new_this_row:
                continue
            self._rowspans[c][1] -= 1
            if self._rowspans[c][1] <= 0:
                del self._rowspans[c]
        return out

    def _implied_close_row(self) -> None:
        if self._row is not None:
            self.items.append(
                (
                    "header_row" if self._row_is_header else "table_row",
                    self._layout_row(self._row),
                )
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
            if self._table_depth == 0:
                self._rowspans = {}
        elif self._table_depth:
            if tag in ("td", "th") and self._cell is not None:
                self._implied_close_cell()
            elif tag == "tr" and self._row is not None:
                self._implied_close_row()
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
