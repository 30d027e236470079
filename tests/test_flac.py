"""FLAC codec: lossless round-trips across every subframe/stereo shape,
CRC seals, and honest gates."""

import struct

import numpy as np
import pytest

from traildb_spark.operators.flac import (
    _crc8,
    _crc16,
    _read_utf8_number,
    _BitReader,
    _utf8_number,
    decode_flac,
    make_flac,
)


def test_flac_roundtrip_fixed_orders_and_partitions():
    rng = np.random.RandomState(3)
    for trial in range(24):
        n = int(rng.randint(1, 700))
        s = rng.randint(-2000, 2000, n).astype(np.int64)
        if trial % 4 == 0:
            s = np.cumsum(rng.randint(-5, 6, n))  # smooth -> tiny residuals
        if trial % 5 == 0:
            s[:] = s[0]  # CONSTANT subframes
        enc = make_flac(
            s.astype(np.int16), 8000, block_size=128,
            order=trial % 5, partition_order=trial % 3,
            verbatim=(trial % 7 == 0),
        )
        rate, ch, dec = decode_flac(enc)
        assert (rate, ch, dec.shape) == (8000, 1, (n,))
        assert (dec == s.astype(np.int16)).all()


def test_flac_stereo_decorrelation_modes():
    rng = np.random.RandomState(5)
    n = 300
    st = rng.randint(-3000, 3000, (n, 2)).astype(np.int16)
    inter = np.empty(n * 2, np.int16)
    inter[0::2], inter[1::2] = st[:, 0], st[:, 1]
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        enc = make_flac(st, 44100, block_size=128, order=2,
                        partition_order=1, stereo_mode=mode)
        rate, ch, dec = decode_flac(enc)
        assert (rate, ch) == (44100, 2)
        assert (dec == inter).all(), mode


def test_flac_lpc_and_wasted_bits():
    rng = np.random.RandomState(7)
    for trial in range(8):
        n = int(rng.randint(3, 900))
        s = np.cumsum(rng.randint(-40, 41, n)).astype(np.int16)
        enc = make_flac(s, 8000, block_size=128, lpc=True,
                        partition_order=trial % 3)
        assert (decode_flac(enc)[2] == s).all()
    s = (rng.randint(-500, 500, 300) * 8).astype(np.int16)
    for kw in (dict(order=2), dict(lpc=True), dict(verbatim=True)):
        enc = make_flac(s, 8000, block_size=64, wasted=3, **kw)
        assert (decode_flac(enc)[2] == s).all()
    with pytest.raises(ValueError):  # samples not divisible by 2^wasted
        make_flac(np.array([1, 2, 3], np.int16), 8000, wasted=2)


def test_flac_compresses_smooth_signals():
    """A genuinely compressed codec: FIXED order-2 + rice beats raw PCM
    by >2x on a random-walk signal."""
    rng = np.random.RandomState(11)
    s = np.cumsum(rng.randint(-3, 4, 4000)).astype(np.int16)
    enc = make_flac(s, 8000, block_size=256, order=2, partition_order=2)
    assert len(enc) < len(s) * 2 / 2
    assert (decode_flac(enc)[2] == s).all()


def test_flac_crc_seals_and_gates():
    s = np.arange(100, dtype=np.int16)
    good = make_flac(s, 8000)
    bad = bytearray(good)
    bad[-1] ^= 0xFF  # frame CRC-16
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    bad = bytearray(good)
    # flip a bit inside the frame header (after the 42-byte STREAMINFO)
    bad[46] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError):  # bad magic
        decode_flac(b"fLaX" + good[4:])
    with pytest.raises(ValueError):  # truncated metadata
        decode_flac(good[:20])
    with pytest.raises(ValueError):  # truncated frames
        decode_flac(good[:50])


def test_flac_utf8_coded_number_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF,
              (1 << 31) - 1, (1 << 36) - 1):
        enc = _utf8_number(v)
        assert _read_utf8_number(_BitReader(enc)) == v


def test_flac_crc_known_vectors():
    """Spec polynomials: CRC-8 0x07, CRC-16 0x8005, both init 0 —
    pinned against independently computed values."""
    assert _crc8(b"") == 0
    assert _crc8(b"\x00") == 0
    assert _crc8(b"123456789") == 0xF4  # standard CRC-8/SMBUS check value
    assert _crc16(b"123456789") == 0xFEE8  # CRC-16/UMTS (BUYPASS) check
    assert struct.pack(">H", _crc16(b"\x00")) == b"\x00\x00"


def test_flac_through_decode_audio_dispatch(spark):
    """'fLaC' payloads route through decode_audio into the shared
    feature kernel alongside wav/aiff/au/voc."""
    from traildb_spark.operators.multimodal import (
        extract_audio_features, sniff_container,
    )

    s = ((np.arange(80, dtype=np.int64) * 53) % 3001 - 1500).astype(np.int16)
    payload = make_flac(s, 8000, block_size=64, order=2)
    assert sniff_container(payload) == "flac"
    rows = [(1, "audio", bytearray(payload), "x/audio", "{}")]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, content binary,"
        " mime string, meta string")
    r = extract_audio_features(df).collect()[0]
    assert (r.sample_rate, r.channels, r.n_samples) == (8000, 1, 80)
    x = s.astype(np.int64)
    assert r.peak == int(np.abs(x).max())
    assert r.zcr == int(np.count_nonzero(x[1:] * x[:-1] < 0))


def test_flac_unknown_total_samples_decodes_to_eof():
    """STREAMINFO total_samples == 0 means 'unknown' per the FLAC spec;
    the decoder must decode frames until the payload ends instead of
    returning an empty stream."""
    import numpy as _np
    s = (_np.arange(700, dtype=_np.int64) * 37 % 4096 - 2048).astype(
        _np.int16)
    enc = bytearray(make_flac(s, 8000, block_size=256))
    # STREAMINFO body starts at byte 8; total_samples is the low nibble
    # of body[13] plus body[14:18] (36 bits after 16+16+24+24+20+3+5).
    enc[8 + 13] &= 0xF0
    enc[8 + 14 : 8 + 18] = b"\x00\x00\x00\x00"
    rate, ch, dec = decode_flac(bytes(enc))
    assert rate == 8000 and ch == 1
    assert (dec == s).all()
