"""Pure-numpy baseline JPEG codec (functions/jpeg.py) — roundtrip fidelity,
stream-shape coverage (gray / 4:4:4 / 4:2:0 / restart intervals), golden
determinism pins, non-baseline rejection, and the multimodal stage wiring.

The codec is the repo's real decode path for ``image/jpeg`` payloads
(reference analog: the opaque resource bodies bcdc2bcdc ships around in
CKAN.py — here they actually decode). SQL oracles can't run an IDCT, so
pixel-level fidelity is pinned HERE; the ``multimodal_jpeg_decode`` query's
DuckDB oracle covers the byte-level header contract (SOF0 dims).
"""

import zlib

import numpy as np
import pyarrow as pa
import pytest

from bcdc2bcdc_ray.functions import jpeg, multimodal


def _smooth_rgb(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 2 + 20), (y * 2 + 30), (x + y + 40)], axis=-1).astype(
        np.uint8
    )


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_roundtrip_color_444():
    img = _smooth_rgb(33, 41)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) > 40


def test_roundtrip_420_subsampled():
    # odd dims exercise the chroma pad + upsample path
    img = _smooth_rgb(33, 41)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95, subsample="420"))
    assert out.shape == img.shape
    assert _psnr(img, out) > 35


def test_roundtrip_restart_intervals():
    img = _smooth_rgb(40, 24)
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    blob = jpeg.encode_jpeg(img, quality=90, restart_interval=3)
    assert b"\xff\xdd" in blob  # DRI segment present
    withrst = jpeg.decode_jpeg(blob)
    # restart markers change the byte stream, not the decoded pixels
    assert (plain == withrst).all()


def test_roundtrip_grayscale_replicates_channels():
    y, x = np.mgrid[0:17, 0:21]
    g = ((x * 3 + y * 5) % 200 + 20).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
    assert out.shape == (17, 21, 3)
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
    assert _psnr(g, out[..., 0]) > 40


def test_lossy_on_noise_but_bounded():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 33, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
    # random noise is JPEG's worst case — still bounded quantization error
    assert _psnr(img, out) > 18


def test_encode_decode_deterministic_golden():
    # pins the exact byte stream AND the exact decoded pixels: any silent
    # behavior change in quant tables, Huffman coding, IDCT or upsampling
    # flips these crcs
    img = _smooth_rgb(25, 31)
    blob = jpeg.encode_jpeg(img, quality=85)
    assert (len(blob), zlib.crc32(blob)) == (743, 1338176090)
    dec = jpeg.decode_jpeg(blob)
    assert zlib.crc32(dec.tobytes()) == 865934749
    fixture = multimodal.synth_jpeg_media_table(8, seed=11)
    assert [zlib.crc32(p) for p in fixture.column("payload").to_pylist()] == [
        1906356726, 4266548660, 841571844, 728689929,
        2620007259, 1451445038, 3210501326, 2648465078,
    ]


def test_rejects_non_baseline_streams():
    img = _smooth_rgb(16, 16)
    blob = bytearray(jpeg.encode_jpeg(img))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"not a jpeg")
    # flip SOF0 → SOF2 (progressive): loud rejection, not garbage output
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        jpeg.decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        jpeg.encode_jpeg(img, subsample="422")
    with pytest.raises(ValueError):
        jpeg.encode_jpeg(np.zeros((4, 4, 4), np.uint8))


def test_decode_stage_real_dims_and_means():
    media = multimodal.synth_jpeg_media_table(12, seed=11)
    out = multimodal.DecodeImage(strict=True)(media)
    assert out.column("decoded_width").to_pylist() == media.column(
        "meta_width"
    ).to_pylist()
    assert out.column("decoded_height").to_pylist() == media.column(
        "meta_height"
    ).to_pylist()
    # means come from the REAL decode: close to the true pixel mean of the
    # pre-encode image family (smooth gradients ⇒ tight quantization error)
    for mid, mean in zip(
        out.column("media_id").to_pylist(), out.column("mean_intensity").to_pylist()
    ):
        pix = jpeg.decode_jpeg(media.column("payload")[mid].as_py())
        assert abs(mean - pix.mean()) < 1e-9


def test_resize_stage_reencodes_jpeg():
    media = multimodal.synth_jpeg_media_table(4, seed=11)
    out = multimodal.ResizeImage(16, 16, strict=True)(media)
    for payload in out.column("payload").to_pylist():
        assert payload[:2] == b"\xff\xd8"
        assert jpeg.decode_jpeg(payload).shape == (16, 16, 3)


def test_resize_preserves_content_not_just_dims():
    # a 2×-downsized smooth gradient should still correlate with the source
    img = _smooth_rgb(32, 32)
    media = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "media_type": pa.array(["image/jpeg"], pa.string()),
            "payload": pa.array([jpeg.encode_jpeg(img, quality=95)], pa.binary()),
            "meta_width": pa.array([32], pa.int32()),
            "meta_height": pa.array([32], pa.int32()),
        },
        schema=multimodal.MEDIA_SCHEMA,
    )
    small = multimodal.ResizeImage(16, 16, strict=True)(media)
    dec = jpeg.decode_jpeg(small.column("payload")[0].as_py())
    ref = multimodal.resize_nearest(img, 16, 16)
    assert _psnr(ref, dec) > 30


def test_corruption_fuzz_surfaces_only_valueerror():
    # non-strict DecodeImage catches ValueError per row — any other
    # exception type escaping the decoder would kill the whole batch task
    img = _smooth_rgb(16, 24)
    blob = jpeg.encode_jpeg(img, quality=85)
    rng = np.random.default_rng(3)
    for cut in range(2, len(blob), 5):
        try:
            jpeg.decode_jpeg(blob[:cut])
        except ValueError:
            pass
    for _ in range(300):
        b = bytearray(blob)
        for _ in range(4):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            jpeg.decode_jpeg(bytes(b))
        except ValueError:
            pass


def test_edge_dimensions_roundtrip():
    # 1-pixel to just-past-MCU sizes, both subsamplings and grayscale —
    # the block/chroma padding edges
    rng = np.random.default_rng(0)
    for h in (1, 2, 7, 8, 9, 17):
        for w in (1, 3, 15, 16):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for sub in ("444", "420"):
                out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsample=sub))
                assert out.shape == (h, w, 3)
            g = rng.integers(0, 256, (h, w), dtype=np.uint8)
            assert jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90)).shape == (h, w, 3)
