"""Real-codec coverage for the multimodal decode path.

The committed fixture ``tests/fixtures/golden_4x4_gray.png`` is a real
PNG (8-bit grayscale, 4x4, filter-0 rows, written with stdlib
zlib/struct — generator preserved in ``test_fixture_is_valid_png``'s
docstring) whose pixel values are known exactly, so the image kernel's
output is a GOLDEN vector, not a statistical check:

- With Pillow installed, ``decode_features`` routes ``image/*`` rows
  through the real ``_decode_kernel_image`` and must reproduce the
  golden features end-to-end through Spark (gated on ``HAS_PIL``).
- Without Pillow (this container), a minimal pure-Python PNG reader
  standing in for the ``open().convert().resize().getdata()`` chain
  drives ``_decode_kernel_image``'s body driver-side, pinning the
  kernel's bytes -> [0,1]-intensity contract in every environment.
"""

from __future__ import annotations

import io
import os
import struct
import zlib

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_4x4_gray.png")
PIXELS = [
    [0, 16, 32, 48],
    [64, 80, 96, 112],
    [128, 144, 160, 176],
    [192, 208, 224, 240],
]
GOLDEN = [px / 255.0 for row in PIXELS for px in row]


def _read_png_gray_4x4(blob: bytes) -> list[int]:
    """Decode the fixture format (8-bit grayscale, filter 0, one IDAT)
    with stdlib only — enough PNG to verify the fixture and to stand
    in for Pillow below."""
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat = 8, b""
    width = height = None
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, color = struct.unpack(">IIBB", data[:10])
            assert (depth, color) == (8, 0), "fixture is 8-bit grayscale"
        elif tag == b"IDAT":
            idat += data
        pos += 12 + length
    raw = zlib.decompress(idat)
    pixels = []
    stride = width + 1
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        assert row[0] == 0, "fixture rows use filter type 0"
        pixels.extend(row[1:])
    return pixels


class _MiniImage:
    """Pillow-API stand-in for the fixture: open/convert/resize/getdata."""

    def __init__(self, pixels):
        self._pixels = pixels

    @staticmethod
    def open(fp):
        return _MiniImage(_read_png_gray_4x4(fp.read()))

    def convert(self, mode):
        assert mode == "L"
        return self  # already 8-bit grayscale

    def resize(self, size):
        assert size == (4, 4)
        return self  # fixture is already 4x4

    def getdata(self):
        return list(self._pixels)


def test_fixture_is_valid_png():
    """Generator (stdlib only):
    raw = b"".join(b"\\x00" + bytes(row) for row in PIXELS)
    png = SIG + chunk(IHDR, pack(">IIBBBBB", 4,4,8,0,0,0,0))
          + chunk(IDAT, zlib.compress(raw)) + chunk(IEND, b"")
    """
    blob = open(FIXTURE, "rb").read()
    assert _read_png_gray_4x4(blob) == [px for row in PIXELS for px in row]
    # CRCs intact (any codec would reject the file otherwise)
    pos = 8
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        body = blob[pos + 4 : pos + 8 + length]
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        assert zlib.crc32(body) & 0xFFFFFFFF == crc
        pos += 12 + length


def test_image_kernel_golden_via_mini_decoder(monkeypatch):
    """Driver-side execution of the REAL image-kernel body in the
    Pillow-less container: the stand-in implements exactly the API
    chain `_decode_kernel_image` uses, over the real fixture bytes."""
    from astro_vectordb_spark.multimodal import binary

    monkeypatch.setattr(binary, "_PILImage", _MiniImage)
    feats = binary._decode_kernel_image(open(FIXTURE, "rb").read())
    assert feats == GOLDEN
    assert len(feats) == binary.FEATURE_DIM


@pytest.mark.skipif(
    not __import__(
        "astro_vectordb_spark.multimodal.binary", fromlist=["HAS_PIL"]
    ).HAS_PIL,
    reason="Pillow not installed (pip install '.[test-media]')",
)
def test_image_decode_golden_end_to_end(spark):
    """With Pillow: the full Spark path (attach blob -> mapInPandas
    decode with media-type routing) reproduces the golden features
    from the committed fixture."""
    from astro_vectordb_spark.multimodal.binary import decode_features

    blob = open(FIXTURE, "rb").read()
    df = spark.createDataFrame(
        [(1, bytearray(blob), "image/png"), (2, bytearray(b"plain"), "text/plain")],
        "doc_id long, blob binary, media_type string",
    )
    out = {
        r["doc_id"]: r["features"]
        for r in decode_features(df, media_type_col="media_type").collect()
    }
    assert out[1] == GOLDEN
    # non-image rows keep the deterministic fallback
    import hashlib

    h = hashlib.sha256(b"plain").digest()
    assert out[2] == [b / 255.0 for b in h[:16]]


@pytest.mark.skipif(
    not __import__(
        "astro_vectordb_spark.multimodal.binary", fromlist=["HAS_PIL"]
    ).HAS_PIL,
    reason="Pillow not installed",
)
def test_pil_resize_semantics_match_kernel():
    """Pins that PIL's identity resize + L-mode convert keep the raw
    intensities — the assumption the golden vector rests on."""
    from PIL import Image

    img = Image.open(io.BytesIO(open(FIXTURE, "rb").read())).convert("L").resize((4, 4))
    assert list(img.getdata()) == [px for row in PIXELS for px in row]
