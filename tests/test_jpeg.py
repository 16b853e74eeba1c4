"""Baseline-JPEG pixel decode (pure numpy) — round-trip tested against
the spec-conformant encoder fixture in jpeg_fixture.py (no PIL/cv2 in
the container, so the fixture IS the ground truth: it emits standard
SOI/DQT/SOF0/DHT/SOS streams any JPEG decoder accepts).
"""

import numpy as np
import pytest

from piglet_spark.datapipe import multimodal as mm
from tests.jpeg_fixture import encode_jpeg


def _test_image(h, w, channels=3, seed=7):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (x * 255 / max(w - 1, 1) * 0.5
            + y * 255 / max(h - 1, 1) * 0.5)
    img = np.stack([np.clip(base + rng.normal(0, 12, (h, w)), 0, 255)
                    for _ in range(channels)], axis=2)
    return img.astype(np.uint8)


def test_jpeg_roundtrip_gray():
    img = _test_image(24, 17, channels=1)
    jpg = encode_jpeg(img[:, :, 0])
    assert mm.detect_format(jpg) == "jpeg"
    out = mm.decode_jpeg(jpg)
    assert out.shape == (24, 17, 1)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4 and err.max() < 40


def test_jpeg_roundtrip_rgb_444():
    img = _test_image(16, 16)
    out = mm.decode_jpeg(encode_jpeg(img))
    assert out.shape == (16, 16, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    # chroma quant entries reach 24 → ±10 mean is normal JPEG loss;
    # a broken decoder shows mean error ~60+ (decorrelated pixels)
    assert err.mean() < 10 and err.max() < 80


def test_jpeg_roundtrip_rgb_420_odd_dims():
    """4:2:0 subsampling + dimensions not multiples of the MCU."""
    img = _test_image(21, 13)
    out = mm.decode_jpeg(encode_jpeg(img, subsample=True))
    assert out.shape == (21, 13, 3)
    # luma must stay tight; chroma is 2x2-pooled so compare Y planes
    def luma(a):
        return (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
                + 0.114 * a[:, :, 2])
    err = np.abs(luma(out.astype(float)) - luma(img.astype(float)))
    assert err.mean() < 6


def test_jpeg_restart_intervals():
    img = _test_image(32, 32)
    plain = mm.decode_jpeg(encode_jpeg(img))
    restarted = mm.decode_jpeg(encode_jpeg(img, restart_interval=2))
    # DRI changes the stream layout, not the pixels
    assert np.array_equal(plain, restarted)


def test_jpeg_flat_color_block():
    """All-AC-zero blocks (EOB-immediately path) decode exactly."""
    img = np.full((8, 8, 3), 128, np.uint8)
    out = mm.decode_jpeg(encode_jpeg(img))
    assert np.abs(out.astype(int) - 128).max() <= 2


def test_jpeg_progressive_raises():
    img = _test_image(8, 8, channels=1)
    jpg = bytearray(encode_jpeg(img[:, :, 0]))
    i = jpg.index(b"\xff\xc0")
    jpg[i + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        mm.decode_jpeg(bytes(jpg))


def test_jpeg_truncated_scan_raises():
    img = _test_image(16, 16)
    jpg = encode_jpeg(img)
    with pytest.raises(ValueError):
        mm.decode_jpeg(jpg[:len(jpg) - len(jpg) // 4])


def test_decode_images_real_jpeg_pixels(spark):
    """The Spark pipeline yields non-null embeddings for baseline
    JPEGs — the r03 verdict's 'dims-only' gap, closed."""
    img = _test_image(16, 16)
    jpg = encode_jpeg(img)
    df = spark.createDataFrame([(1, bytearray(jpg))],
                               ["doc_id", "payload"])
    r = mm.decode_images(df).collect()[0]
    assert (r["width"], r["height"]) == (16, 16)
    assert r["embedding"] is not None
    # features come from REAL pixels: channel-0 mean tracks the image
    assert r["embedding"][0] == pytest.approx(
        float(img[:, :, 0].mean() / 255.0), abs=0.05)


def test_decode_images_progressive_jpeg_degrades_to_dims(spark):
    """A JPEG the numpy decoder refuses (progressive SOF2 — the most
    common web encoding) must NOT abort the Spark job: decode_images
    degrades that row to (w, h, null embedding) from the header, the
    pre-pixel-decode contract."""
    ok = encode_jpeg(_test_image(16, 16))
    prog = bytearray(encode_jpeg(_test_image(8, 8)))
    i = prog.index(b"\xff\xc0")
    prog[i + 1] = 0xC2  # flip SOF0 → SOF2
    df = spark.createDataFrame(
        [(1, bytearray(ok)), (2, bytes(prog))], ["doc_id", "payload"])
    rows = {r["doc_id"]: r for r in mm.decode_images(df).collect()}
    assert rows[1]["embedding"] is not None
    assert (rows[2]["width"], rows[2]["height"]) == (8, 8)
    assert rows[2]["embedding"] is None


def test_decode_images_truncated_jpeg_degrades_to_dims(spark):
    """Corrupt entropy data (truncated scan) degrades to dims-only
    instead of crashing the batch."""
    jpg = encode_jpeg(_test_image(16, 16))
    cut = jpg[:len(jpg) - len(jpg) // 4]
    df = spark.createDataFrame([(1, bytes(cut))], ["doc_id", "payload"])
    r = mm.decode_images(df).collect()[0]
    assert (r["width"], r["height"]) == (16, 16)
    assert r["embedding"] is None


def test_jpeg_non_interleaved_scan_refused():
    """A scan covering fewer components than the frame (multi-scan
    baseline) is refused, not silently mis-decoded with interleaved
    MCU geometry."""
    img = _test_image(16, 16)
    jpg = bytearray(encode_jpeg(img))
    i = jpg.index(b"\xff\xda")
    # SOS header: len(2) ns(1) [cs tabs]*ns ss se ah_al — shrink the
    # component list from 3 to 1 and fix the segment length
    seglen = (jpg[i + 2] << 8) | jpg[i + 3]
    assert jpg[i + 4] == 3
    new = jpg[:i + 2] + bytes([0, seglen - 4, 1]) \
        + bytes(jpg[i + 5:i + 7]) + bytes(jpg[i + 11:])
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        mm.decode_jpeg(bytes(new))


def test_resize_images_jpeg(spark):
    img = _test_image(16, 16)
    df = spark.createDataFrame([(1, bytearray(encode_jpeg(img)))],
                               ["doc_id", "payload"])
    r = mm.resize_images(df, out_w=4, out_h=4).collect()[0]
    assert (r["width"], r["height"]) == (16, 16)
    assert len(bytes(r["rgb"])) == 4 * 4 * 3
