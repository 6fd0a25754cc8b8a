"""Per-codec decode cost over the bench corpus media mix (VERDICT r3
item 7): driver-side timing of ``imaging.codecs.decode_image`` on every
media blob of the bench corpus, grouped by sniffed format (progressive
JPEG split out via the SOF2 marker). Prints a markdown table of
ms/page + share of total decode time so the optimization target is
the measured top path, not a guess. Usage:
    python tools/codec_profile.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def _is_progressive_jpeg(b: bytes) -> bool:
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return False
        m = b[i + 1]
        if m == 0xC2:
            return True
        if m in (0xC0, 0xC1):
            return False
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        i += 2 + int.from_bytes(b[i + 2:i + 4], "big")
    return False


def main() -> None:
    import pandas as pd

    from bench import _corpus
    from ocr_to_csv_spark.imaging.codecs import decode_image, sniff_format

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
    d = _corpus(n_docs)
    import glob

    files = glob.glob(f"{d}/media.parquet") + glob.glob(
        f"{d}/media.parquet/*.parquet"
    )
    media = pd.concat(pd.read_parquet(f) for f in files if not
                      f.endswith("_SUCCESS"))
    stats: dict[str, list[float]] = {}
    pixels: dict[str, int] = {}
    t_all0 = time.time()
    for blob in media["content"]:
        b = bytes(blob)
        fmt = sniff_format(b)
        if fmt == "jpeg" and _is_progressive_jpeg(b):
            fmt = "jpeg-progressive"
        t0 = time.perf_counter()
        try:
            img = decode_image(b)
            px = img.shape[0] * img.shape[1]
        except Exception:
            fmt, px = f"{fmt}-corrupt", 0
        dt = (time.perf_counter() - t0) * 1000
        stats.setdefault(fmt, []).append(dt)
        pixels[fmt] = pixels.get(fmt, 0) + px
    total = sum(sum(v) for v in stats.values())
    print(f"corpus: {n_docs} docs, {len(media)} media blobs, "
          f"decode wall {time.time() - t_all0:.1f}s (1 thread)\n")
    print("| codec | pages | ms/page | Mpx/s | share of decode time |")
    print("|---|---|---|---|---|")
    for fmt, v in sorted(stats.items(), key=lambda kv: -sum(kv[1])):
        mpxs = (pixels.get(fmt, 0) / 1e6) / (sum(v) / 1000) if sum(v) else 0
        print(f"| {fmt} | {len(v)} | {sum(v)/len(v):.2f} | {mpxs:.1f} "
              f"| {100*sum(v)/total:.1f}% |")


if __name__ == "__main__":
    main()
