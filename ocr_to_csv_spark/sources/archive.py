"""TAR and ZIP container sources — the two archive formats document
dumps actually arrive in (ustar POSIX tarballs; ZIP with store/deflate
members). Pure struct-level parsers on top of zlib only — no
tarfile/zipfile dependency, so the byte-level framing (checksums,
central directory, CRC32) is verified by OUR code and malformed
archives quarantine instead of raising.

Reference parity: the reference scrapes a directory of loose image
files (modules/image_scraper.py); a tarball/zip of documents is the
same entry point one container later, exactly as sources/warc.py is
the crawl-shaped analogue.

Scale story (100 TB): archives are read as whole blobs (binaryFile —
one task per archive, the natural partitioning for mirror dumps);
member fan-out happens INSIDE an Arrow-batched mapInPandas stage.
TAR's 512-byte framing and ZIP's central directory are both O(members)
single passes; nothing shuffles until the caller aggregates.

Quarantine contract (warc.py convention): a framing failure emits the
members recovered so far PLUS one status='corrupt_*' marker row —
never a task failure. A ZIP member whose stored CRC32 mismatches the
recomputed one still parses but carries crc_ok = 0 (bit-rot
detection, not rejection).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

TAR_SCHEMA = (
    "tar_ref string, idx int, name string, size long, text string, "
    "n_tokens long, status string"
)
ZIP_SCHEMA = (
    "zip_ref string, idx int, name string, method string, size long, "
    "crc_ok int, text string, n_tokens long, status string"
)


# ---------------------------------------------------------------- TAR


def _tar_header(name: str, size: int, prefix: str = "") -> bytes:
    h = bytearray(512)
    nb = name.encode()
    h[0 : len(nb)] = nb
    if prefix:  # ustar long-path: leading dirs live in bytes 345..500
        pb = prefix.encode()
        h[345 : 345 + len(pb)] = pb
    h[100:108] = b"0000644\x00"
    h[108:116] = b"0000000\x00"
    h[116:124] = b"0000000\x00"
    h[124:136] = f"{size:011o}\x00".encode()
    h[136:148] = b"00000000000\x00"
    h[148:156] = b"        "  # checksum placeholder (spaces)
    h[156] = ord("0")  # regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = f"{chk:06o}\x00 ".encode()
    return bytes(h)


def synth_tar(seed: int, n_members: int = 5):
    """Deterministic ustar archive + expected member rows."""
    ref = f"tar-{seed}"
    out = bytearray()
    gold = []
    for i in range(n_members):
        name = f"docs/doc_{seed}_{i}.txt"
        prefix = ""
        if i == n_members - 1:
            # exercise the ustar prefix field: full path > 100 chars,
            # split into (prefix dirs, ≤100-char name)
            prefix = "mirror/" + "/".join(
                f"depth{seed}_{k:02d}" for k in range(10)
            )
            name = f"doc_{seed}_{i}_long.txt"
        text = " ".join(
            f"tar{seed} member{i} tok{j}" for j in range(4 + (seed + i) % 5)
        )
        data = text.encode()
        out += _tar_header(name, len(data), prefix=prefix)
        out += data
        pad = (-len(data)) % 512
        out += b"\x00" * pad
        gold.append(
            {
                "tar_ref": ref,
                "idx": i,
                "name": (prefix + "/" + name) if prefix else name,
                "size": len(data),
                "text": text,
                "n_tokens": len(text.split()),
                "status": "ok",
            }
        )
    out += b"\x00" * 1024
    return bytes(out), gold


def _corrupt_tar_row(ref: str) -> dict:
    return {
        "tar_ref": ref, "idx": -1, "name": "", "size": -1, "text": "",
        "n_tokens": -1, "status": "corrupt_tar",
    }


def _parse_tar(ref: str, data: bytes) -> list[dict]:
    rows: list[dict] = []
    pos = 0
    idx = 0
    while pos + 512 <= len(data):
        h = data[pos : pos + 512]
        if h == b"\x00" * 512:
            return rows  # end-of-archive
        if h[257:262] != b"ustar":
            rows.append(_corrupt_tar_row(ref))
            return rows
        stored = h[148:156]
        probe = bytearray(h)
        probe[148:156] = b"        "
        try:
            chk = int(stored.rstrip(b"\x00 ").decode() or "0", 8)
            size = int(
                h[124:136].rstrip(b"\x00 ").decode() or "0", 8
            )
        except ValueError:
            rows.append(_corrupt_tar_row(ref))
            return rows
        if sum(probe) != chk:
            rows.append(_corrupt_tar_row(ref))
            return rows
        name = h[0:100].rstrip(b"\x00").decode(errors="replace")
        # ustar long paths: the 155-byte prefix field (bytes 345..500)
        # holds the leading directory components; members past 100 chars
        # are silently truncated without it (POSIX.1-1988 §10.1).
        prefix = h[345:500].rstrip(b"\x00").decode(errors="replace")
        if prefix:
            name = prefix + "/" + name
        body = data[pos + 512 : pos + 512 + size]
        if len(body) < size:
            rows.append(_corrupt_tar_row(ref))
            return rows
        text = body.decode(errors="replace")
        rows.append(
            {
                "tar_ref": ref, "idx": idx, "name": name, "size": size,
                "text": text, "n_tokens": len(text.split()),
                "status": "ok",
            }
        )
        idx += 1
        pos += 512 + size + ((-size) % 512)
    if pos != len(data):
        rows.append(_corrupt_tar_row(ref))
    elif not rows:
        rows.append(_corrupt_tar_row(ref))
    return rows


def tar_members(blobs: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for ref, data in zip(b["tar_ref"], b["content"]):
                rows.extend(_parse_tar(str(ref), bytes(data)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "tar_ref", "idx", "name", "size", "text",
                    "n_tokens", "status",
                ],
            )

    return blobs.mapInPandas(gen, schema=TAR_SCHEMA)


# ---------------------------------------------------------------- ZIP


def synth_zip(seed: int, n_members: int = 4):
    """Deterministic ZIP (store for even members, deflate for odd) +
    expected member rows."""
    ref = f"zip-{seed}"
    out = bytearray()
    central = bytearray()
    gold = []
    for i in range(n_members):
        name = f"z/doc_{seed}_{i}.txt".encode()
        text = " ".join(
            f"zip{seed} m{i} w{j}" for j in range(3 + (seed + i) % 6)
        )
        raw = text.encode()
        crc = zlib.crc32(raw) & 0xFFFFFFFF
        if i % 2 == 0:
            method, payload = 0, raw
        else:
            method = 8
            payload = zlib.compress(raw, 6)[2:-4]  # raw deflate stream
        off = len(out)
        lh = (
            b"PK\x03\x04" + (20).to_bytes(2, "little")
            + (0).to_bytes(2, "little") + method.to_bytes(2, "little")
            + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
            + crc.to_bytes(4, "little")
            + len(payload).to_bytes(4, "little")
            + len(raw).to_bytes(4, "little")
            + len(name).to_bytes(2, "little") + (0).to_bytes(2, "little")
            + name
        )
        out += lh + payload
        central += (
            b"PK\x01\x02" + (20).to_bytes(2, "little")
            + (20).to_bytes(2, "little") + (0).to_bytes(2, "little")
            + method.to_bytes(2, "little")
            + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
            + crc.to_bytes(4, "little")
            + len(payload).to_bytes(4, "little")
            + len(raw).to_bytes(4, "little")
            + len(name).to_bytes(2, "little")
            + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
            + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + off.to_bytes(4, "little")
            + name
        )
        gold.append(
            {
                "zip_ref": ref, "idx": i, "name": name.decode(),
                "method": "store" if method == 0 else "deflate",
                "size": len(raw), "crc_ok": 1, "text": text,
                "n_tokens": len(text.split()), "status": "ok",
            }
        )
    cd_off = len(out)
    out += central
    out += (
        b"PK\x05\x06" + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
        + n_members.to_bytes(2, "little") + n_members.to_bytes(2, "little")
        + len(central).to_bytes(4, "little") + cd_off.to_bytes(4, "little")
        + (0).to_bytes(2, "little")
    )
    return bytes(out), gold


def _corrupt_zip_row(ref: str) -> dict:
    return {
        "zip_ref": ref, "idx": -1, "name": "", "method": "", "size": -1,
        "crc_ok": 0, "text": "", "n_tokens": -1, "status": "corrupt_zip",
    }


def _parse_zip(ref: str, data: bytes) -> list[dict]:
    rows: list[dict] = []
    eocd = data.rfind(b"PK\x05\x06")
    if eocd < 0 or eocd + 22 > len(data):
        return [_corrupt_zip_row(ref)]
    n = int.from_bytes(data[eocd + 10 : eocd + 12], "little")
    cd_off = int.from_bytes(data[eocd + 16 : eocd + 20], "little")
    pos = cd_off
    for idx in range(n):
        if data[pos : pos + 4] != b"PK\x01\x02":
            rows.append(_corrupt_zip_row(ref))
            return rows
        method = int.from_bytes(data[pos + 10 : pos + 12], "little")
        crc = int.from_bytes(data[pos + 16 : pos + 20], "little")
        csize = int.from_bytes(data[pos + 20 : pos + 24], "little")
        usize = int.from_bytes(data[pos + 24 : pos + 28], "little")
        namelen = int.from_bytes(data[pos + 28 : pos + 30], "little")
        extralen = int.from_bytes(data[pos + 30 : pos + 32], "little")
        cmtlen = int.from_bytes(data[pos + 32 : pos + 34], "little")
        lho = int.from_bytes(data[pos + 42 : pos + 46], "little")
        name = data[pos + 46 : pos + 46 + namelen].decode(errors="replace")
        # local header: skip its own name/extra lengths
        if data[lho : lho + 4] != b"PK\x03\x04":
            rows.append(_corrupt_zip_row(ref))
            return rows
        lnl = int.from_bytes(data[lho + 26 : lho + 28], "little")
        lxl = int.from_bytes(data[lho + 28 : lho + 30], "little")
        start = lho + 30 + lnl + lxl
        payload = data[start : start + csize]
        if len(payload) < csize:
            rows.append(_corrupt_zip_row(ref))
            return rows
        try:
            if method == 0:
                raw = payload
            elif method == 8:
                raw = zlib.decompress(payload, -15)
            else:
                raise ValueError("method")
        except Exception:
            rows.append(_corrupt_zip_row(ref))
            return rows
        crc_ok = int((zlib.crc32(raw) & 0xFFFFFFFF) == crc and
                     len(raw) == usize)
        text = raw.decode(errors="replace")
        rows.append(
            {
                "zip_ref": ref, "idx": idx, "name": name,
                "method": "store" if method == 0 else "deflate",
                "size": len(raw), "crc_ok": crc_ok, "text": text,
                "n_tokens": len(text.split()), "status": "ok",
            }
        )
        pos += 46 + namelen + extralen + cmtlen
    return rows if rows else [_corrupt_zip_row(ref)]


def zip_members(blobs: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for ref, data in zip(b["zip_ref"], b["content"]):
                rows.extend(_parse_zip(str(ref), bytes(data)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "zip_ref", "idx", "name", "method", "size",
                    "crc_ok", "text", "n_tokens", "status",
                ],
            )

    return blobs.mapInPandas(gen, schema=ZIP_SCHEMA)
