"""ISO BMFF container codec (functions/mp4.py) — real box-walk parsing,
layout invariants the SQL oracle leans on, malformed-stream rejection, and
the honest frame-decode stub."""

import struct
import zlib

import numpy as np
import pytest

from bcdc2bcdc_ray.functions import mp4


def test_roundtrip_metadata():
    sizes = [100, 250, 80, 4000]
    blob = mp4.encode_mp4(
        sizes, width=320, height=240, timescale=90000, sample_delta=3000,
        codec=b"avc1", mdat_seed=7,
    )
    meta = mp4.parse_mp4(blob)
    assert meta["brand"] == "isom"
    assert (meta["width"], meta["height"]) == (320, 240)
    assert (meta["timescale"], meta["duration"]) == (90000, 12000)
    assert meta["codec"] == "avc1"
    assert meta["n_samples"] == 4 and meta["sample_sizes"] == sizes
    assert meta["sample_delta"] == 3000
    assert meta["mdat_bytes"] == sum(sizes)


def test_fixed_layout_offsets_hold():
    # the SQL oracle reads these constants — any encoder layout change must
    # fail HERE, not silently in the driver compare
    blob = mp4.encode_mp4([10, 20], width=100, height=50, timescale=600,
                          sample_delta=25)
    assert struct.unpack_from(">I", blob, 52)[0] == 600  # mvhd timescale
    assert struct.unpack_from(">I", blob, 56)[0] == 50  # mvhd duration
    assert struct.unpack_from(">H", blob, 232)[0] == 100  # tkhd width 16.16 hi
    assert struct.unpack_from(">H", blob, 236)[0] == 50  # tkhd height
    assert blob[406:410] == b"mp4v"  # stsd fourcc
    assert struct.unpack_from(">I", blob, 508)[0] == 25  # stts delta
    assert struct.unpack_from(">I", blob, 556)[0] == 2  # stsz count
    assert struct.unpack_from(">I", blob, 560)[0] == 10  # first sample size
    # stco points at the mdat payload
    stco_off = struct.unpack_from(">I", blob, blob.find(b"stco") + 12)[0]
    mdat_type = blob.find(b"mdat")
    assert stco_off == mdat_type + 4


def test_walker_handles_streams_we_did_not_write():
    # 64-bit largesize box + mvhd v1 (u64 duration) + fixed-size stsz:
    # shapes our encoder never emits, which a real parser must still read
    mvhd_v1 = mp4._full(
        b"mvhd", 1, 0,
        struct.pack(">QQIQ", 0, 0, 1000, 5_000_000_000)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + mp4._MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
    )
    stsz_fixed = mp4._full(b"stsz", 0, 0, struct.pack(">II", 512, 3))
    stbl = mp4._box(b"stbl", stsz_fixed)
    minf = mp4._box(b"minf", stbl)
    mdia = mp4._box(b"mdia", minf)
    trak = mp4._box(b"trak", mdia)
    moov_payload = mvhd_v1 + trak
    # moov as a largesize (size=1 + u64) box
    moov = struct.pack(">I", 1) + b"moov" + struct.pack(
        ">Q", 16 + len(moov_payload)
    ) + moov_payload
    ftyp = mp4._box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42")
    meta = mp4.parse_mp4(ftyp + moov)
    assert meta["brand"] == "mp42"
    assert meta["duration"] == 5_000_000_000  # u64 survived
    assert meta["sample_sizes"] == [512, 512, 512]


def test_rejects_malformed():
    with pytest.raises(ValueError, match="ftyp"):
        mp4.parse_mp4(b"\x00\x00\x00\x08free")
    blob = bytearray(mp4.encode_mp4([10], width=16, height=16))
    struct.pack_into(">I", blob, 24, 1 << 30)  # moov claims to run past EOF
    with pytest.raises(ValueError, match="malformed"):
        mp4.parse_mp4(bytes(blob))
    with pytest.raises(ValueError, match="mvhd"):
        mp4.parse_mp4(mp4._box(b"ftyp", b"isom" + b"\x00" * 8))


def test_frame_decode_is_a_loud_stub():
    blob = mp4.encode_mp4([10, 10], width=16, height=16)
    with pytest.raises(NotImplementedError, match="codec"):
        mp4.decode_mp4_frames(blob)


def test_fixture_deterministic():
    a = mp4.synth_mp4_media_table(6, seed=13)
    b = mp4.synth_mp4_media_table(6, seed=13)
    assert a.equals(b)
    crc = [zlib.crc32(p) for p in a.column("payload").to_pylist()]
    assert crc == [zlib.crc32(p) for p in b.column("payload").to_pylist()]
    for payload, w, h in zip(
        a.column("payload").to_pylist(),
        a.column("meta_width").to_pylist(),
        a.column("meta_height").to_pylist(),
    ):
        meta = mp4.parse_mp4(payload)
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["mdat_bytes"] == sum(meta["sample_sizes"])


def test_corruption_fuzz_surfaces_only_valueerror():
    blob = mp4.encode_mp4([50, 60], width=32, height=16)
    rng = np.random.default_rng(3)
    for cut in range(2, len(blob), 5):
        try:
            mp4.parse_mp4(blob[:cut])
        except ValueError:
            pass
    for _ in range(300):
        b = bytearray(blob)
        for _ in range(4):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            mp4.parse_mp4(bytes(b))
        except ValueError:
            pass
