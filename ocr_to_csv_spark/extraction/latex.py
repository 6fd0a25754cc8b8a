"""LaTeX main-content extraction — arXiv-corpus format breadth next to
HTML (``html_extract.py``) and markdown (``markdown.py``): ``tabular``
environments map to the same (header_row, table_row) items the HTML
<table> harvester emits, and preamble/markup boilerplate is stripped
the way the HTML path strips <nav>/<script>/<style>.

Parity contract (mirrors ``parse_html``/``parse_markdown``): returns
ordered [('text', str) | ('header_row', [cells]) | ('table_row',
[cells])].

Rules (deterministic, shared with the datagen golden builder):
- ``%`` comments drop (unescaped ``%`` truncates the rest of the
  line; ``\\%`` is a literal percent and survives, unescaped).
- Preamble/structure commands are boilerplate: ``\\documentclass``,
  ``\\usepackage``, ``\\begin{document}``/``\\end{document}``,
  ``\\maketitle``, ``\\centering``, ``\\label{..}``, ``\\hline`` —
  whole-line occurrences drop.
- ``\\section{..}`` / ``\\subsection{..}`` → their own text item,
  braces stripped.
- ``\\begin{tabular}{spec} .. \\end{tabular}``: body splits on
  ``\\\\`` row separators, cells on ``&`` (trimmed); the first row is
  the header_row, the rest table_row — the markdown pipe-table
  convention (the pipeline drops header_row per F5).
- ``\\textbf{x}`` / ``\\textit{x}`` / ``\\emph{x}`` unwrap to x
  (applied anywhere, including table cells).
- Inline math ``$...$`` drops (math is not extractable text);
  surrounding whitespace collapses.
- ``\\item`` markers strip; content joins the paragraph.
- Other contiguous non-blank lines join (space-separated) into one
  text item per blank-line-delimited paragraph; any other ``\\foo``
  command line that produced no text drops silently.

Reference parity: the reference has no LaTeX input; this extends S1
kind dispatch (``image_scraper.py:103-106``) the same way markdown
(corpus v9) did.
"""

from __future__ import annotations

import re

_WRAP = re.compile(r"\\(?:textbf|textit|emph)\{([^{}]*)\}")
_CMD = re.compile(r"\\[a-zA-Z]+\*?")
_MATH = re.compile(r"\$[^$]*\$")
_SECTION = re.compile(r"^\\(?:sub)*section\*?\{(.*)\}\s*$")
_BOILER = re.compile(
    r"^\\(?:documentclass|usepackage|maketitle|centering|label|"
    r"begin\{document\}|end\{document\}|hline)"
)
_BEGIN_TAB = re.compile(r"^\\begin\{tabular\}(\{[^}]*\})?\s*$")
_END_TAB = re.compile(r"^\\end\{tabular\}\s*$")


def _strip_comment(line: str) -> str:
    out = []
    i = 0
    while i < len(line):
        c = line[i]
        if c == "\\" and i + 1 < len(line) and line[i + 1] == "%":
            out.append("%")
            i += 2
            continue
        if c == "%":
            break
        out.append(c)
        i += 1
    return "".join(out)


def _clean(text: str) -> str:
    """Unwrap formatting commands, drop inline math, tidy spaces."""
    prev = None
    while prev != text:
        prev = text
        text = _WRAP.sub(r"\1", text)
    text = _MATH.sub(" ", text)
    text = _CMD.sub(" ", text)  # unknown commands drop, their text stays
    text = text.replace("{", " ").replace("}", " ")
    return re.sub(r"\s+", " ", text).strip()


def parse_latex(text: str) -> list[tuple[str, object]]:
    """Parse one LaTeX document into ordered content items (module
    docstring contract)."""
    items: list[tuple[str, object]] = []
    para: list[str] = []

    def flush() -> None:
        if para:
            items.append(("text", " ".join(para)))
            para.clear()

    lines = (text or "").split("\n")
    i, n = 0, len(lines)
    in_tab = False
    tab_body: list[str] = []
    while i < n:
        raw = _strip_comment(lines[i])
        ln = raw.strip()
        i += 1
        if in_tab:
            if _END_TAB.match(ln):
                in_tab = False
                body = " ".join(tab_body)
                first = True
                for row in body.split(r"\\"):
                    row = row.replace(r"\hline", " ").strip()
                    if not row:
                        continue
                    cells = [_clean(c) for c in row.split("&")]
                    items.append(
                        ("header_row" if first else "table_row", cells)
                    )
                    first = False
                tab_body = []
            else:
                tab_body.append(raw)
            continue
        if not ln:
            flush()
            continue
        if _BEGIN_TAB.match(ln):
            flush()
            in_tab = True
            tab_body = []
            continue
        m = _SECTION.match(ln)
        if m:
            flush()
            title = _clean(m.group(1))
            if title:
                items.append(("text", title))
            continue
        if _BOILER.match(ln):
            continue
        if ln.startswith(r"\item"):
            ln = ln[len(r"\item"):].strip()
        cleaned = _clean(ln)
        if cleaned:
            para.append(cleaned)
        # a command line that cleaned to nothing drops silently
    flush()
    return items
