"""TAR/ZIP container sources — the stdlib tarfile/zipfile modules act
as fully independent verifiers of our struct-level parsers (we never
import them in the engine), plus the quarantine and CRC-bit-rot pins."""

import io
import tarfile
import zipfile


def test_synth_tar_is_valid_ustar_and_parser_agrees():
    from ocr_to_csv_spark.sources.archive import _parse_tar, synth_tar

    for seed in (0, 3):
        data, gold = synth_tar(seed, n_members=5)
        with tarfile.open(fileobj=io.BytesIO(data)) as tf:
            members = tf.getmembers()
            assert [m.name for m in members] == [g["name"] for g in gold]
            for m, g in zip(members, gold):
                assert tf.extractfile(m).read().decode() == g["text"]
        rows = _parse_tar(f"tar-{seed}", data)
        assert [
            (r["idx"], r["name"], r["size"], r["text"], r["status"])
            for r in rows
        ] == [
            (g["idx"], g["name"], g["size"], g["text"], "ok") for g in gold
        ]


def test_synth_zip_is_valid_zip_and_parser_agrees():
    from ocr_to_csv_spark.sources.archive import _parse_zip, synth_zip

    for seed in (0, 5):
        data, gold = synth_zip(seed, n_members=4)
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            assert zf.namelist() == [g["name"] for g in gold]
            for g in gold:
                assert zf.read(g["name"]).decode() == g["text"]
            assert zf.testzip() is None  # stdlib CRC check passes
        rows = _parse_zip(f"zip-{seed}", data)
        assert [
            (r["idx"], r["name"], r["method"], r["crc_ok"], r["text"])
            for r in rows
        ] == [
            (g["idx"], g["name"], g["method"], 1, g["text"]) for g in gold
        ]


def test_tar_quarantine_paths():
    from ocr_to_csv_spark.sources.archive import _parse_tar, synth_tar

    assert _parse_tar("t", b"junk" * 200)[-1]["status"] == "corrupt_tar"
    data, gold = synth_tar(1, n_members=4)
    # flip a magic byte in member 2's header: 0-1 recover, then marker
    off = 0
    for _ in range(2):
        hsz = int(data[off + 124 : off + 136].rstrip(b"\x00 "), 8)
        off += 512 + hsz + ((-hsz) % 512)
    bad = data[: off + 257] + b"X" + data[off + 258 :]
    rows = _parse_tar("t", bad)
    assert [r["status"] for r in rows] == ["ok", "ok", "corrupt_tar"]
    assert rows[0]["text"] == gold[0]["text"]


def test_zip_quarantine_and_crc_bitrot():
    from ocr_to_csv_spark.sources.archive import _parse_zip, synth_zip

    data, gold = synth_zip(2, n_members=3)
    assert _parse_zip("z", data[:-12])[-1]["status"] == "corrupt_zip"
    cd = data.find(b"PK\x01\x02")
    flipped = data[: cd + 16] + bytes([data[cd + 16] ^ 0xFF]) + data[cd + 17 :]
    rows = _parse_zip("z", flipped)
    assert [r["crc_ok"] for r in rows] == [0, 1, 1]
    assert [r["status"] for r in rows] == ["ok", "ok", "ok"]
    # bit-rot is detected, not rejected: the text still extracts
    assert rows[0]["text"] == gold[0]["text"]


def test_spark_member_fanout(spark):
    from ocr_to_csv_spark.sources.archive import (
        synth_tar, synth_zip, tar_members, zip_members,
    )

    tblobs = spark.createDataFrame(
        [(f"tar-{s}", bytearray(synth_tar(s)[0])) for s in range(3)],
        "tar_ref string, content binary",
    )
    got = tar_members(tblobs).collect()
    assert len(got) == 15 and all(r.status == "ok" for r in got)
    zblobs = spark.createDataFrame(
        [(f"zip-{s}", bytearray(synth_zip(s)[0])) for s in range(3)],
        "zip_ref string, content binary",
    )
    gz = zip_members(zblobs).collect()
    assert len(gz) == 12 and all(r.crc_ok == 1 for r in gz)
