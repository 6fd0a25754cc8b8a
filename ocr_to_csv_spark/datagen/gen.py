"""Generate the interleaved text+media document corpus plus golden outputs.

Schemas per FIXTURES.md: ``documents(doc_id, spans[])``, ``media``,
``aliases``, and flat golden tables ``expected_spans`` / ``expected_rows``.
Every random draw is seeded per-document (seed ⊕ doc index) so any subset
of documents regenerates identically regardless of generation order —
required for distributed regeneration and resume tests.

Golden outputs encode the intended end-to-end semantics:
- html spans → harvested text blocks + table rows (header rows dropped,
  boilerplate stripped)
- text spans → passthrough
- image/pdf_page spans → date boxes (regex-matched first, reference
  main.py:176-180 ordering) then table rows as matched alias values with
  page dates appended (reference main.py:182,199), blank rows dropped
  (reference modules/sanity.py:55-67)
"""

from __future__ import annotations

import argparse
import os
import random
import re

import numpy as np
import pandas as pd

from ..imaging import gif as gifc
from ..imaging import jpeg, png, render
from ..imaging import webp as webpc

# bump when generated content changes shape OR codec numerics change:
# consumers cache corpora in /tmp keyed by (docs, seed) and regenerate
# when the version file differs (goldens must match the current codecs)
GEN_VERSION = 10  # v10: latex span kind (tabular + sections + preamble strip)

DATE_RE = re.compile(r"\d{1,2}\/\d{1,2}\/(\d{4}|\d{2})")

FIRST = ["JOHN", "MARY", "ALICE", "BOB", "CARLOS", "DIANA", "EVE", "FRANK",
         "GRACE", "HENRY", "IVY", "JACK", "KAREN", "LIAM", "Nina", "OSCAR"]
LAST = ["SMITH", "JONES", "WANG", "BROWN", "GARCIA", "LEE", "PATEL", "KIM",
        "NGUYEN", "DAVIS", "MILLER", "WILSON", "MOORE", "TAYLOR", "CLARK", "LOPEZ"]
PURPOSES = ["ROBOTICS", "CODING", "CHESS CLUB", "STUDY HALL", "TUTORING",
            "ART", "MUSIC", "DEBATE", "SCIENCE FAIR", "MATH TEAM", "DRAMA", "YEARBOOK"]
DISTRACTOR_NAMES = ["ZOE ADAMS", "YURI VOLKOV", "XENA PRICE", "WALT FISHER",
                    "VERA STONE", "URI GOLD", "TINA BLACK", "SAM RIVERS"]
DISTRACTOR_PURPOSES = ["POTTERY", "SWIMMING", "ARCHERY", "FENCING"]
WORDS = ("the quick brown fox jumps over a lazy dog while many small tables "
         "hold rows of names and times for every visitor here today").split()
DAYS = ["MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY", "FRIDAY"]

HEADER = ["NO", "NAME", "TIME IN", "TIME OUT", "HOURS", "PURPOSE"]


def name_pool() -> list[str]:
    # NINA upper-cased here; 'Nina' above keeps line lengths honest
    return sorted({f"{f.upper()} {l}" for f, l in zip(FIRST, LAST)})


def alias_names() -> list[str]:
    return sorted({n.lower() for n in name_pool()} | {n.lower() for n in DISTRACTOR_NAMES})


def alias_purposes() -> list[str]:
    return sorted({p.lower() for p in PURPOSES} | {p.lower() for p in DISTRACTOR_PURPOSES})


def _rand_time(rng: random.Random) -> str:
    return f"{rng.randint(1, 12)}:{rng.randint(0, 59):02d}"


def _rand_date(rng: random.Random) -> str:
    yr = rng.choice([f"{rng.randint(2019, 2026)}", f"{rng.randint(19, 26)}"])
    return f"{rng.randint(1, 12)}/{rng.randint(1, 28)}/{yr}"


def _sheet_rows(rng: random.Random, n_rows: int) -> list[list[str]]:
    """Ground-truth data rows (without header / '#' column)."""
    pool = name_pool()
    rows, prev_name = [], None
    for _ in range(n_rows):
        if rng.random() < 0.08:
            rows.append(["", "", "", "", ""])  # blank row → must be dropped
            continue
        if prev_name and rng.random() < 0.15:
            name = prev_name  # duplicate name → exercises sanity dedup W1
        else:
            name = rng.choice(pool)
        prev_name = name
        t_in = _rand_time(rng)
        t_out = _rand_time(rng)
        hours = str(rng.randint(1, 9)) if rng.random() < 0.7 else ""
        purpose = rng.choice(PURPOSES) if rng.random() < 0.85 else ""
        rows.append([name, t_in, t_out, hours, purpose])
    return rows


def _golden_dates(box_texts: list[str]) -> list[str]:
    """Date ordering parity: regex matches are insert(0)-prepended (so they
    reverse among themselves), others append (reference main.py:176-180)."""
    out: list[str] = []
    for t in box_texts:
        stripped = t.replace("\n", "").replace(" ", "")
        if DATE_RE.match(stripped):
            out.insert(0, stripped)
        else:
            out.append(stripped)
    return out


def _html_doc(rng: random.Random, n_table_rows: int) -> tuple[str, list]:
    """Build an HTML document + its golden items [('text', s) | ('table_row', cells)]."""
    paras = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(4, 12)))
        for _ in range(rng.randint(1, 3))
    ]
    rows = _sheet_rows(rng, n_table_rows)
    nav = "".join(f"<a href='/x{i}'>item {i}</a>" for i in range(4))
    trs = "".join(
        "<tr>" + "".join(f"<td>{c.title() if i == 0 else c}</td>" for i, c in enumerate(r)) + "</tr>"
        for r in rows
    )
    head_tr = "<tr>" + "".join(f"<th>{h}</th>" for h in HEADER[1:]) + "</tr>"
    html = (
        "<html><head><title>t</title><script>var x=1;</script>"
        "<style>.a{color:red}</style></head><body>"
        f"<nav>{nav}</nav><header>Site Header</header>"
        + "".join(f"<p>{p}</p>" for p in paras)
        + (f"<table>{head_tr}{trs}</table>" if n_table_rows else "")
        + "<footer>copyright</footer></body></html>"
    )
    golden: list = [("text", p) for p in paras]
    for r in rows:
        golden.append(("table_row", [r[0].title()] + r[1:]))
    return html, golden


def _md_doc(rng: random.Random, n_table_rows: int) -> tuple[str, list]:
    """Build a markdown document + golden items (mirrors ``_html_doc``:
    heading/paragraphs kept, nav links / hr / code fences are
    boilerplate, pipe table maps to header_row + table_rows)."""
    heading = " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 5)))
    paras = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(4, 12)))
        for _ in range(rng.randint(1, 3))
    ]
    rows = _sheet_rows(rng, n_table_rows)
    nav = " ".join(f"[item {i}](/x{i})" for i in range(3))
    lines = [f"## {heading}", "", nav, ""]
    for p in paras:
        lines.append(p)
        lines.append("")
    lines += ["```", "var x = 1;", "```", ""]
    if n_table_rows:
        lines.append("| " + " | ".join(HEADER[1:]) + " |")
        lines.append("|" + "---|" * len(HEADER[1:]))
        for r in rows:
            lines.append("| " + " | ".join([r[0].title()] + r[1:]) + " |")
        lines.append("")
    lines.append("---")
    golden: list = [("text", heading)] + [("text", p) for p in paras]
    for r in rows:
        golden.append(("table_row", [r[0].title()] + r[1:]))
    return "\n".join(lines), golden


def _latex_doc(rng: random.Random, n_table_rows: int) -> tuple[str, list]:
    """Build a LaTeX document + golden items (mirrors ``_md_doc``:
    section/paragraphs kept — with \\textbf unwrapping and inline math
    dropped — preamble/comments/labels are boilerplate, tabular maps to
    header_row + table_rows)."""
    heading = " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 5)))
    paras = []
    for _ in range(rng.randint(1, 3)):
        ws = [rng.choice(WORDS) for _ in range(rng.randint(4, 12))]
        b = rng.randrange(len(ws))
        golden_p = " ".join(ws)
        ws_tex = list(ws)
        ws_tex[b] = "\\textbf{" + ws[b] + "}"
        if rng.random() < 0.5:
            ws_tex.append("$x^{2}+1$")  # math drops from the golden
        paras.append((" ".join(ws_tex), golden_p))
    rows = _sheet_rows(rng, n_table_rows)
    lines = [
        "\\documentclass{article}",
        "\\usepackage{amsmath}",
        "% generated fixture " + str(rng.randint(0, 999)),
        "\\begin{document}",
        "\\maketitle",
        f"\\section{{{heading}}}",
        "\\label{sec:one}",
        "",
    ]
    for tex, _ in paras:
        lines.append(tex)
        lines.append("")
    if n_table_rows:
        lines.append("\\begin{tabular}{|" + "l|" * len(HEADER[1:]) + "}")
        lines.append("\\hline")
        lines.append(" & ".join(HEADER[1:]) + " \\\\")
        lines.append("\\hline")
        for r in rows:
            lines.append(" & ".join([r[0].title()] + r[1:]) + " \\\\")
        lines.append("\\end{tabular}")
        lines.append("")
    lines.append("\\end{document}")
    golden: list = [("text", heading)] + [
        ("text", g) for _, g in paras
    ]
    for r in rows:
        golden.append(("table_row", [r[0].title()] + r[1:]))
    return "\n".join(lines), golden


def _render_span_page(
    rng: random.Random, n_rows: int
) -> tuple[np.ndarray, list, list[str]]:
    """Render a sheet page; return (page_array, ground_rows, golden_dates)."""
    rows = _sheet_rows(rng, n_rows)
    table = [HEADER] + [
        [str(i + 1)] + r for i, r in enumerate(rows)
    ]
    boxes: list[str] = []
    draw = rng.random()
    if draw < 0.45:
        boxes = [_rand_date(rng)]
    elif draw < 0.7:
        boxes = [_rand_date(rng), rng.choice(DAYS)]
    elif draw < 0.8:
        boxes = [rng.choice(DAYS)]
    page = render.render_page(
        table,
        dates=boxes,
        decoy_frame=rng.random() < 0.3,
        decoy_blob=rng.random() < 0.3,
    )
    return page, rows, _golden_dates(boxes)


def _tint(page: np.ndarray) -> np.ndarray:
    """Deterministic RGB tint whose luma fold stays within ~1 gray level
    of the source page (far inside the binarization margin)."""
    p = page.astype(np.int32)
    return np.stack(
        [np.clip(p + 18, 0, 255), p, np.clip(p - 30, 0, 255)], axis=-1
    ).astype(np.uint8)


def _encode_media(
    rng: random.Random, page: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Encode one page in the corpus v6 format mix — every format
    ``cv2.imread`` accepts in the reference (image_scraper.py:103-114)
    plus the two remaining crawl-corpus staples: PNG (gray + truecolor),
    baseline JPEG (gray, with/without restart markers, and 3-component
    color), progressive JPEG (SOF2), BMP (8-bit paletted + 24-bit BGR),
    TIFF (gray + RGB strips), lossless WebP (VP8L), and GIF (sequential
    + interlaced LZW). Returns
    (blob, expected_decoded_plane): exact pre-encode arrays for lossless
    paths, the deterministic decode for lossy JPEG, and the truncating
    luma fold for color (matching each decoder bit-for-bit). q95 keeps
    binarization bit-identical so OCR goldens hold for every format."""
    from ..imaging import simple_formats as simplec

    draw = rng.random()
    if draw < 0.05:
        blob = jpeg.encode_gray(page, quality=95, restart_interval=8)
        return blob, jpeg.decode(blob)
    if draw < 0.10:
        blob = jpeg.encode_gray(page, quality=95)
        return blob, jpeg.decode(blob)
    if draw < 0.14:
        blob = jpeg.encode_gray_progressive(page, quality=95)
        return blob, jpeg.decode(blob)
    if draw < 0.18:
        blob = jpeg.encode_color(_tint(page), quality=95)
        return blob, jpeg.decode(blob)
    if draw < 0.23:
        return simplec.encode_gray_bmp(page), page
    if draw < 0.27:
        rgb = _tint(page)
        return simplec.encode_rgb_bmp(rgb), simplec._fold(rgb)
    if draw < 0.32:
        return simplec.encode_tiff(page), page
    if draw < 0.36:
        rgb = _tint(page)
        return simplec.encode_tiff(rgb), simplec._fold(rgb)
    if draw < 0.42:
        rgb = _tint(page)
        return png.encode_rgb(rgb), simplec._fold(rgb)
    if draw < 0.47:
        return webpc.encode_gray(page), page
    if draw < 0.55:
        return gifc.encode_gray(page, interlace=rng.random() < 0.5), page
    return png.encode_gray(page), page


def _golden_media(
    ref: str, content: bytes, page: np.ndarray | None
) -> tuple[dict, dict | None]:
    """Golden metadata + feature rows for one media blob. ``page`` is the
    plane the decoder must reproduce bit-for-bit (pre-encode array for
    lossless formats, deterministic decode for lossy JPEG, truncating
    luma fold for color — see ``_encode_media``); PDF container blobs
    get a metadata-only row (fmt='pdf', no image stats, no features)."""
    from ..imaging.codecs import sniff_format
    from ..imaging.ocr import _resize_mean

    fmt = sniff_format(content)
    if fmt == "pdf":
        return (
            {"media_ref": ref, "fmt": "pdf", "width": -1, "height": -1,
             "n_bytes": len(content), "mean_intensity": None,
             "fill_ratio": None},
            None,
        )
    meta = {
        "media_ref": ref,
        "fmt": fmt,
        "width": int(page.shape[1]),
        "height": int(page.shape[0]),
        "n_bytes": len(content),
        "mean_intensity": round(float(page.mean()), 4),
        "fill_ratio": round(float((page < 128).mean()), 4),
    }
    small = _resize_mean(page < 128, 16, 16)
    hist = np.bincount(
        np.minimum((page.astype(np.int32) * 8) // 256, 7).ravel(), minlength=8
    ).astype(np.float64)
    hist = hist / max(1.0, hist.sum())
    feat = np.concatenate([small.ravel(), hist]).astype(np.float32)
    return meta, {"media_ref": ref, "feat": feat.tolist()}


def _expected_image_rows(ground_rows: list, dates: list[str]) -> list[list[str]]:
    """Matched-value rows the pipeline must produce for one page: alias-
    cased values, blank-row removal on the first 4 slots (reference
    modules/sanity.py:55-67 via main.py:231-233)."""
    out = []
    for r in ground_rows:
        if all(v == "" for v in r[:4]):
            continue  # check_blank_row drops on first-4 only
        out.append([r[0].lower(), r[1], r[2], r[3], r[4].lower()] + dates)
    return out


def gen_corpus(
    n_docs: int, seed: int = 42, start: int = 0
) -> dict[str, pd.DataFrame]:
    """Generate documents [start, start+n_docs). Per-document seeding means
    any chunking produces identical documents — the basis for parallel
    generation in ``write_corpus``."""
    docs, media, exp_spans, exp_rows = [], [], [], []
    exp_media_meta, exp_media_feat = [], []

    for d in range(start, start + n_docs):
        doc_id = f"doc-{d:06d}"
        rng = random.Random(f"{seed}:{d}")
        mega_html = d % 97 == 96
        mega_image = d % 211 == 210

        if mega_html:
            kinds = ["html"]
        elif mega_image:
            kinds = ["image"]
        else:
            n_spans = rng.randint(1, 6)
            kinds = [
                rng.choices(
                    ["html", "text", "image", "pdf_page", "pdf", "markdown",
                     "latex"],
                    weights=[0.33, 0.21, 0.20, 0.07, 0.05, 0.08, 0.06],
                )[0]
                for _ in range(n_spans)
            ]

        # ``offset`` is the raw span index in the input document; ``eff``
        # is the POST-pdf-expansion ordinal the pipeline renumbers to
        # (each embedded PDF page becomes its own offset) — golden rows
        # key on eff
        spans, order, eff = [], 0, 0
        for offset, kind in enumerate(kinds):
            if kind == "html":
                n_rows = 1500 if mega_html else (rng.randint(1, 22) if rng.random() < 0.8 else 0)
                html, golden = _html_doc(rng, n_rows)
                spans.append(
                    {"kind": "html", "text": html, "media_ref": None, "offset": offset}
                )
                row_num = 0
                for g_kind, payload in golden:
                    if g_kind == "text":
                        exp_spans.append((doc_id, "text", payload, None, order))
                    else:
                        exp_spans.append(
                            (doc_id, "table_row", ",".join(payload), None, order)
                        )
                        row_num += 1
                        exp_rows.append(
                            (doc_id, eff, row_num, *payload, None, None)
                        )
                    order += 1
                eff += 1
            elif kind in ("markdown", "latex"):
                n_rows = rng.randint(1, 22) if rng.random() < 0.8 else 0
                builder = _md_doc if kind == "markdown" else _latex_doc
                md, golden = builder(rng, n_rows)
                spans.append(
                    {"kind": kind, "text": md, "media_ref": None,
                     "offset": offset}
                )
                row_num = 0
                for g_kind, payload in golden:
                    if g_kind == "text":
                        exp_spans.append((doc_id, "text", payload, None, order))
                    else:
                        exp_spans.append(
                            (doc_id, "table_row", ",".join(payload), None, order)
                        )
                        row_num += 1
                        exp_rows.append(
                            (doc_id, eff, row_num, *payload, None, None)
                        )
                    order += 1
                eff += 1
            elif kind == "text":
                blob = " ".join(rng.choice(WORDS) for _ in range(rng.randint(4, 14)))
                spans.append(
                    {"kind": "text", "text": blob, "media_ref": None, "offset": offset}
                )
                exp_spans.append((doc_id, "text", blob, None, order))
                order += 1
                eff += 1
            elif kind == "pdf":  # multi-page PDF container (S2 fan-out)
                n_pages = rng.randint(1, 3)
                ref = f"m-{d:06d}-{offset}"
                page_data = []
                for p in range(n_pages):
                    page, ground, dates = _render_span_page(rng, rng.randint(1, 6))
                    page_data.append((page, ground, dates))
                from ..sources.pdf import build_pdf

                blob = build_pdf([pd_[0] for pd_ in page_data])
                spans.append(
                    {"kind": "pdf", "text": None, "media_ref": ref, "offset": offset}
                )
                media.append(
                    {"media_ref": ref, "content": blob, "width": 0, "height": 0}
                )
                g_meta, _ = _golden_media(ref, blob, None)
                exp_media_meta.append(g_meta)
                for p, (page, ground, dates) in enumerate(page_data):
                    pref = f"{ref}#p{p}"
                    for dstr in dates:
                        exp_spans.append((doc_id, "date", dstr, pref, order))
                        order += 1
                    rows_out = _expected_image_rows(ground, dates)
                    for i, r in enumerate(rows_out):
                        exp_spans.append(
                            (doc_id, "table_row", ",".join(r), pref, order)
                        )
                        padded = (r + [None, None])[:7]
                        exp_rows.append((doc_id, eff, i + 1, *padded))
                        order += 1
                    eff += 1
            else:  # image | pdf_page (pre-rendered page media)
                n_rows = 150 if mega_image else rng.randint(1, 8)
                page, ground, dates = _render_span_page(rng, n_rows)
                content, dec_plane = _encode_media(rng, page)
                ref = f"m-{d:06d}-{offset}"
                spans.append(
                    {"kind": kind, "text": None, "media_ref": ref, "offset": offset}
                )
                media.append(
                    {"media_ref": ref, "content": content, "width": 0, "height": 0}
                )
                g_meta, g_feat = _golden_media(ref, content, dec_plane)
                exp_media_meta.append(g_meta)
                if g_feat is not None:
                    exp_media_feat.append(g_feat)
                for dstr in dates:
                    exp_spans.append((doc_id, "date", dstr, ref, order))
                    order += 1
                rows_out = _expected_image_rows(ground, dates)
                for i, r in enumerate(rows_out):
                    exp_spans.append((doc_id, "table_row", ",".join(r), ref, order))
                    padded = (r + [None, None])[:7]
                    exp_rows.append((doc_id, eff, i + 1, *padded))
                    order += 1
                eff += 1
        docs.append({"doc_id": doc_id, "spans": spans})

    aliases = [{"col": 1, "value": v} for v in alias_names()] + [
        {"col": 5, "value": v} for v in alias_purposes()
    ]
    return {
        "documents": pd.DataFrame(docs),
        "media": pd.DataFrame(
            media, columns=["media_ref", "content", "width", "height"]
        ),
        "aliases": pd.DataFrame(aliases),
        "expected_spans": pd.DataFrame(
            exp_spans, columns=["doc_id", "kind", "text", "media_ref", "order"]
        ),
        "expected_rows": pd.DataFrame(
            exp_rows,
            columns=["doc_id", "page", "row", "name", "time_in", "time_out",
                     "hours", "purpose", "date", "day"],
        ),
        "expected_media_meta": pd.DataFrame(
            exp_media_meta,
            columns=["media_ref", "fmt", "width", "height", "n_bytes",
                     "mean_intensity", "fill_ratio"],
        ),
        "expected_media_feat": pd.DataFrame(
            exp_media_feat, columns=["media_ref", "feat"]
        ),
    }


def _limit_blas_threads() -> None:
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
              "NUMEXPR_NUM_THREADS"):
        os.environ[v] = "1"


def _write_chunk(args: tuple) -> tuple:
    """Worker: generate docs [start, start+count) and write one shard of
    documents/media; return the golden tables for parent-side concat."""
    out_dir, start, count, seed, shard_idx = args
    t = gen_corpus(count, seed, start=start)
    t["documents"].to_parquet(
        os.path.join(out_dir, "documents.parquet", f"part-{shard_idx:05d}.parquet"),
        index=False,
    )
    t["media"].to_parquet(
        os.path.join(out_dir, "media.parquet", f"part-{shard_idx:05d}.parquet"),
        index=False,
    )
    return (t["expected_spans"], t["expected_rows"],
            t["expected_media_meta"], t["expected_media_feat"])


def write_corpus(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    shard_rows: int = 50,
    workers: int | None = None,
) -> None:
    """Write the corpus. ``documents``/``media`` are written as SHARDED
    parquet datasets (a ``<name>.parquet/`` directory of part files) once
    they exceed a couple of shards — mirroring real many-split inputs so
    Spark's scan parallelizes; a single small file would feed the whole
    first stage to one task. Golden tables stay single-file (read by
    pandas/DuckDB oracles). Sharded generation runs in a process pool
    (per-document seeding ⇒ identical output at any parallelism)."""
    os.makedirs(out_dir, exist_ok=True)
    if n_docs <= 2 * shard_rows:
        tables = gen_corpus(n_docs, seed)
        for name, df in tables.items():
            df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
        _stamp_version(out_dir)
        return

    os.makedirs(os.path.join(out_dir, "documents.parquet"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "media.parquet"), exist_ok=True)
    chunks = [
        (out_dir, s, min(shard_rows, n_docs - s), seed, i)
        for i, s in enumerate(range(0, n_docs, shard_rows))
    ]
    import concurrent.futures as cf

    n_workers = workers or min(16, os.cpu_count() or 4)
    goldens: list[tuple] = []
    # forked workers inherit the parent's BLAS state; the package
    # __init__ pins BLAS to 1 thread/process BEFORE numpy first loads,
    # so each worker's batched codec matmuls stay single-threaded and
    # the pool parallelism is real (not N_workers x N_threads thrash)
    with cf.ProcessPoolExecutor(
        max_workers=n_workers, initializer=_limit_blas_threads
    ) as pool:
        goldens = list(pool.map(_write_chunk, chunks))
    golden_names = ("expected_spans", "expected_rows",
                    "expected_media_meta", "expected_media_feat")
    for i, name in enumerate(golden_names):
        pd.concat([g[i] for g in goldens], ignore_index=True).to_parquet(
            os.path.join(out_dir, f"{name}.parquet"), index=False
        )
    aliases = pd.DataFrame(
        [{"col": 1, "value": v} for v in alias_names()]
        + [{"col": 5, "value": v} for v in alias_purposes()]
    )
    aliases.to_parquet(os.path.join(out_dir, "aliases.parquet"), index=False)
    _stamp_version(out_dir)


def _stamp_version(out_dir: str) -> None:
    with open(os.path.join(out_dir, "_gen_version.txt"), "w") as f:
        f.write(str(GEN_VERSION))


def corpus_is_current(out_dir: str) -> bool:
    """True when ``out_dir`` holds a complete corpus written by THIS
    generator version — consumers caching corpora in /tmp call this
    instead of probing a single marker file."""
    try:
        with open(os.path.join(out_dir, "_gen_version.txt")) as f:
            return f.read().strip() == str(GEN_VERSION)
    except OSError:
        return False


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--docs", type=int, default=200)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    write_corpus(a.out, a.docs, a.seed)
    print(f"wrote corpus of {a.docs} docs to {a.out}")
