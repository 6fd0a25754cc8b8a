"""Pure-numpy baseline JPEG codec (imaging/jpeg.py): roundtrip quality,
restart markers, corrupt-stream handling, and codec dispatch — S3 parity
with the reference's jpg/jpeg acceptance (image_scraper.py:103-114)."""

import numpy as np
import pytest

from ocr_to_csv_spark.imaging import codecs, jpeg, png, render
from ocr_to_csv_spark.datagen.gen import HEADER


def _gradient(h=100, w=120):
    img = np.zeros((h, w), dtype=np.uint8)
    img[:] = np.linspace(30, 220, w, dtype=np.uint8)[None, :]
    img[20:40, 20:90] = 0
    return img


def test_roundtrip_quality_monotone():
    img = _gradient()
    errs = []
    for q in (50, 75, 90, 95):
        out = jpeg.decode(jpeg.encode_gray(img, q))
        assert out.shape == img.shape
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs == sorted(errs, reverse=True)  # higher quality → lower error
    assert errs[-1] < 1.0


def test_rendered_page_binarizes_identically():
    """The OCR contract: at q>=90 a rendered sheet page must binarize
    bit-identically to the original, so segmentation + glyph
    classification are unaffected by the lossy roundtrip."""
    table = [HEADER] + [
        [str(i), "JOHN SMITH", "1:30", "2:45", "3", "ROBOTICS"]
        for i in range(1, 6)
    ]
    page = render.render_page(table, dates=["1/2/2024"])
    out = jpeg.decode(jpeg.encode_gray(page, 90))
    assert ((out > 128) == (page > 128)).all()


def test_restart_interval_roundtrip_identical():
    img = _gradient()
    base = jpeg.decode(jpeg.encode_gray(img, 90))
    for ri in (1, 3, 7, 100):
        out = jpeg.decode(jpeg.encode_gray(img, 90, restart_interval=ri))
        assert np.array_equal(out, base)


def test_odd_dimensions_pad_and_crop():
    img = _gradient(57, 83)  # non-multiple-of-8 dims
    out = jpeg.decode(jpeg.encode_gray(img, 95))
    assert out.shape == (57, 83)


def test_corrupt_streams_raise_valueerror():
    img = _gradient(24, 24)
    data = jpeg.encode_gray(img, 90)
    with pytest.raises(ValueError):
        jpeg.decode(b"\xff\xd8" + b"\x00" * 10)  # no scan
    with pytest.raises(ValueError):
        jpeg.decode(b"not a jpeg")
    # progressive marker (SOF2) must be rejected, not mis-decoded
    sof0 = data.index(b"\xff\xc0")
    prog = data[:sof0] + b"\xff\xc2" + data[sof0 + 2 :]
    with pytest.raises(ValueError):
        jpeg.decode(prog)


def test_codec_dispatch_and_dims():
    img = _gradient(40, 60)
    jp = jpeg.encode_gray(img, 95)
    pn = png.encode_gray(img)
    assert codecs.sniff_format(jp) == "jpeg"
    assert codecs.sniff_format(pn) == "png"
    assert codecs.image_dims(jp) == (60, 40)
    assert codecs.image_dims(pn) == (60, 40)
    assert np.array_equal(codecs.decode_image(pn), img)
    assert codecs.decode_image(jp).shape == img.shape
    with pytest.raises(ValueError):
        codecs.decode_image(b"RIFF....WAVE")
