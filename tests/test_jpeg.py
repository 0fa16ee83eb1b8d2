"""Pure-stdlib baseline JPEG codec (operators/jpeg.py) — the exactness
and tolerance contracts the MJPEG entry's symbolic oracle relies on,
plus decoder hardening (refusals must be loud, never a mis-decode)."""

import struct

import pytest
from hypothesis import given, settings, strategies as st

from user_feed_cdc_spark.operators.jpeg import decode_jpeg, encode_jpeg


def test_flat_blocks_round_trip_exactly():
    """The oracle-load-bearing contract: a solid-color block at
    quant=1 is DC-only (DC = 8*(v-128), exactly representable) and the
    IDCT of a DC-only block has zero rounding error — every sample
    returns bit-exact. Checked for every possible value."""
    for v in range(256):
        p = bytes([v]) * 64
        assert decode_jpeg(encode_jpeg(8, 8, p, gray=True)) == (8, 8, 1, p)


def test_flat_multiblock_and_padded_dims_exact():
    """Flat content stays exact across multiple MCUs and non-multiple-
    of-8 dims (edge-replication padding preserves flatness)."""
    for w, h in ((16, 8), (8, 24), (5, 7), (12, 10)):
        p = bytes([137]) * (w * h)
        assert decode_jpeg(encode_jpeg(w, h, p, gray=True)) == (w, h, 1, p)


@settings(max_examples=15, deadline=None)
@given(
    dims=st.sampled_from([(8, 8), (16, 8), (8, 16), (5, 7), (12, 10)]),
    data=st.data(),
)
def test_gray_round_trip_within_one(dims, data):
    """Arbitrary grayscale content at quant=1: the only loss is DCT
    coefficient rounding, which bounds reconstruction error at +/-1
    per sample (measured; the hypothesis sweep keeps it honest)."""
    w, h = dims
    p = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    dw, dh, nc, out = decode_jpeg(encode_jpeg(w, h, p, gray=True))
    assert (dw, dh, nc) == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(p, out)) <= 1


@settings(max_examples=10, deadline=None)
@given(
    dims=st.sampled_from([(8, 8), (16, 16), (10, 6)]),
    data=st.data(),
)
def test_color_round_trip_within_five(dims, data):
    """4:4:4 color at quant=1: each YCbCr plane reconstructs within
    +/-1 (coefficient rounding, as the gray test pins) plus the
    forward conversion's own +/-0.5 rounding; the inverse transform
    scales the chroma error by up to 1.772 and rounds once more, so
    the worst per-channel error is ~|1.5| + 1.772*|1.5| + 0.5 < 5.
    Typical images sit at 2-3; hypothesis hunts the adversarial
    corners (a 4 has been observed)."""
    w, h = dims
    n = w * h * 3
    p = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
    dw, dh, nc, out = decode_jpeg(encode_jpeg(w, h, p, gray=False))
    assert (dw, dh, nc) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(p, out)) <= 5


def test_quantization_degrades_gracefully():
    """Higher quant still decodes (coarser, never an error), and the
    error grows with the quantizer as a sanity direction check."""
    import random

    rng = random.Random(11)
    p = bytes(rng.randrange(256) for _ in range(64))

    def err(q):
        *_, out = decode_jpeg(encode_jpeg(8, 8, p, gray=True, quant=q))
        return max(abs(a - b) for a, b in zip(p, out))

    assert err(1) <= 1
    assert err(1) <= err(8) <= err(64)


def test_decoder_refusals_are_loud():
    """Anything outside supported Huffman 8-bit forms raises ValueError
    (normalized to DecodeError at the AVI boundary) — truncation,
    missing SOI, corrupt Huffman counts, and a baseline stream
    relabeled SOF2 (whose baseline SOS tail Se=63 is malformed for a
    progressive DC scan). Never a silent wrong image."""
    good = encode_jpeg(8, 8, bytes(64), gray=True)

    with pytest.raises(ValueError):
        decode_jpeg(b"")
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError):
        decode_jpeg(good[:-20])  # truncated entropy data / lost EOI

    prog = bytearray(good)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2  # SOF0 -> SOF2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))

    subs = bytearray(good)
    sof = subs.index(b"\xff\xc0")
    subs[sof + 11] = 0x22  # 2x2 sampling factors
    with pytest.raises(ValueError):
        decode_jpeg(bytes(subs))

    bad_dht = bytearray(good)
    dht = bad_dht.index(b"\xff\xc4")
    bad_dht[dht + 5] = 200  # length-1 count inconsistent with symbols
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad_dht))


def test_420_flat_mcu_round_trips_exactly():
    """The 4:2:0 oracle-load-bearing contract: a solid gray-RGB frame
    at quant=1 survives encode->decode BIT-EXACTLY — r=g=b=v maps to
    YCbCr (v,128,128) exactly, the 2x2 chroma mean of equal values is
    exact, every block is DC-only, and nearest upsampling of a
    constant is the constant. Checked for every value, plus
    multi-MCU frames where each 16x16 MCU is a different flat value,
    plus non-multiple-of-16 dims (edge replication preserves
    flatness)."""
    for v in range(256):
        p = bytes([v, v, v]) * 256
        assert decode_jpeg(
            encode_jpeg(16, 16, p, gray=False, subsampling="420")
        ) == (16, 16, 3, p)

    # 2x1 MCU grid, different flat values per MCU
    buf = bytearray()
    for _y in range(16):
        buf += bytes([40, 40, 40]) * 16 + bytes([201, 201, 201]) * 16
    p = bytes(buf)
    assert decode_jpeg(
        encode_jpeg(32, 16, p, gray=False, subsampling="420")
    ) == (32, 16, 3, p)

    for w, h in ((13, 9), (16, 10), (5, 16)):
        p = bytes([77, 77, 77]) * (w * h)
        assert decode_jpeg(
            encode_jpeg(w, h, p, gray=False, subsampling="420")
        ) == (w, h, 3, p)


@settings(max_examples=10, deadline=None)
@given(
    base=st.integers(min_value=30, max_value=200),
    step=st.integers(min_value=0, max_value=2),
)
def test_420_smooth_content_tolerance(base, step):
    """Smoothly-varying color at 4:2:0 quant=1: chroma loses at most
    the within-2x2-neighborhood variation (bounded by the gradient
    step) plus coefficient rounding — the honest contract of chroma
    subsampling. A per-channel bound of 4*step+4 holds for horizontal
    gradients (measured with margin; hypothesis keeps it honest)."""
    w = h = 16
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(
                [
                    min(255, base + step * x),
                    min(255, base + step * (x + y) // 2),
                    min(255, base + step * y),
                ]
            )
    enc = encode_jpeg(w, h, bytes(px), gray=False, subsampling="420")
    _, _, _, out = decode_jpeg(enc)
    err = max(abs(a - b) for a, b in zip(px, out))
    assert err <= 4 * step + 4, err


def test_420_is_decodable_by_general_reader_not_encoder_shaped():
    """A 4:2:0 stream must decode through the same spec-general path
    as 4:4:4 — segment reordering and APPn/COM insertion change
    nothing (the reader takes tables and sampling factors from the
    FILE)."""
    p = bytes([90, 90, 90]) * 256
    good = encode_jpeg(16, 16, p, gray=False, subsampling="420")
    soi, rest = good[:2], good[2:]
    app0 = b"\xff\xe0" + struct.pack(">H", 7) + b"JFIF\x00"
    assert decode_jpeg(soi + app0 + rest) == (16, 16, 3, p)


def test_exotic_sampling_still_refuses():
    """Factors beyond the supported envelope stay loud refusals:
    luma 3x1 (invalid-for-us h factor) and sampled chroma (2x2 luma
    with 2x1 chroma) must raise, and grayscale still requires 1x1."""
    good = bytearray(
        encode_jpeg(16, 16, bytes([90, 90, 90]) * 256, gray=False,
                    subsampling="420")
    )
    sof = good.index(b"\xff\xc0")
    luma3 = bytearray(good)
    luma3[sof + 11] = 0x31  # luma 3x1
    with pytest.raises(ValueError, match="unsupported"):
        decode_jpeg(bytes(luma3))
    chroma2 = bytearray(good)
    chroma2[sof + 14] = 0x21  # Cb 2x1
    with pytest.raises(ValueError, match="chroma"):
        decode_jpeg(bytes(chroma2))

    gray = bytearray(encode_jpeg(8, 8, bytes(64), gray=True))
    sofg = gray.index(b"\xff\xc0")
    gray[sofg + 11] = 0x22
    with pytest.raises(ValueError, match="grayscale"):
        decode_jpeg(bytes(gray))


def test_huge_declared_dims_refuse_before_allocating():
    """Resource-exhaustion guard (r10 ADVICE): a tiny payload whose SOF
    declares 65535x65535 must raise ValueError BEFORE the multi-GB
    plane allocation — the entropy bytes present can't possibly cover
    the declared MCU count (every block costs >= 2 bits)."""
    import time

    good = bytearray(encode_jpeg(8, 8, bytes(64), gray=True))
    sof = good.index(b"\xff\xc0")
    struct.pack_into(">HH", good, sof + 5, 65535, 65535)
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="entropy bytes"):
        decode_jpeg(bytes(good))
    # the refusal is a header-arithmetic check, not an allocation race
    assert time.monotonic() - t0 < 1.0


def test_decoder_is_spec_general_not_encoder_shaped():
    """The decoder must read tables from the FILE, not assume this
    encoder's: re-emit a stream with the same entropy data but the
    DHT/DQT segments in a different order and an APP0+COM inserted —
    a conforming reader is indifferent to segment order and unknown
    APPn/COM segments."""
    good = encode_jpeg(8, 8, bytes(range(56, 120)), gray=True)
    soi, rest = good[:2], good[2:]

    def seg_at(buf, marker):
        i = buf.index(marker)
        (ln,) = struct.unpack_from(">H", buf, i + 2)
        return i, buf[i : i + 2 + ln]

    di, dqt = seg_at(rest, b"\xff\xdb")
    hi, dht = seg_at(rest, b"\xff\xc4")
    fi, sof = seg_at(rest, b"\xff\xc0")
    tail_start = rest.index(b"\xff\xda")
    tail = rest[tail_start:]
    app0 = b"\xff\xe0" + struct.pack(">H", 7) + b"JFIF\x00"
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    reordered = soi + app0 + dht + com + dqt + sof + tail
    assert decode_jpeg(bytes(reordered)) == decode_jpeg(good)


def test_restart_markers_decode():
    """DRI/RSTn handling: splice a DRI segment and restart markers
    into a 4-MCU stream the hard way — re-encode block-by-block with
    byte-aligned RST boundaries and reset DC prediction — and the
    decoder must reproduce the no-restart image exactly."""
    from user_feed_cdc_spark.operators.jpeg import (
        _BitWriter,
        _ENC_AC_BITS,
        _ENC_AC_VALS,
        _ENC_DC_BITS,
        _ENC_DC_VALS,
        _canonical_codes,
        _encode_block,
    )

    w, h = 16, 16  # 4 MCUs
    pixels = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
    plain = encode_jpeg(w, h, pixels, gray=True)
    _, _, _, want = decode_jpeg(plain)

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    pieces = []
    for mcu_idx, (by, bx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        bw_ = _BitWriter()
        samples = [
            pixels[(by * 8 + y) * w + bx * 8 + x]
            for y in range(8)
            for x in range(8)
        ]
        _encode_block(bw_, samples, 0, 1, dc_codes, ac_codes)  # pred reset
        pieces.append(bw_.flush())
    entropy = b""
    for i, piece in enumerate(pieces):
        entropy += piece
        if i < 3:
            entropy += bytes([0xFF, 0xD0 + i])  # RST0..RST2
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)  # restart every 1 MCU
    sos_at = plain.index(b"\xff\xda")
    (sos_len,) = struct.unpack_from(">H", plain, sos_at + 2)
    header = plain[:sos_at] + dri + plain[sos_at : sos_at + 2 + sos_len]
    restarted = header + entropy + b"\xff\xd9"
    assert decode_jpeg(bytes(restarted)) == (w, h, 1, want)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_decoder_survives_arbitrary_bytes(data):
    """Fuzz the untrusted-bytes contract: random payloads and random
    single-byte corruptions of a valid stream either decode (returning
    well-formed output) or raise ValueError — never another exception
    class, never a hang. This is the boundary DECODE_FALLBACK_ERRORS
    relies on at the AVI layer."""
    mode = data.draw(st.sampled_from(["random", "corrupt", "truncate"]))
    if mode == "random":
        blob = bytes(
            data.draw(st.lists(st.integers(0, 255), min_size=0, max_size=200))
        )
    else:
        good = bytearray(encode_jpeg(8, 8, bytes(range(100, 164)), gray=True))
        if mode == "corrupt":
            i = data.draw(st.integers(0, len(good) - 1))
            good[i] = data.draw(st.integers(0, 255))
        else:
            good = good[: data.draw(st.integers(0, len(good) - 1))]
        blob = bytes(good)
    try:
        w, h, nc, out = decode_jpeg(blob)
        assert len(out) == w * h * (3 if nc == 3 else 1)
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# Progressive (SOF2) — T.81 Annex G
# ---------------------------------------------------------------------------

from user_feed_cdc_spark.operators.jpeg import encode_jpeg_progressive


def test_progressive_flat_blocks_round_trip_exactly():
    """The flat-block exactness contract extends to progressive: every
    scan path (DC successive approximation, AC spectral bands, AC
    refinement, EOB runs) reassembles the exact DC-only coefficients,
    and the IDCT of a DC-only block is bit-exact."""
    for v in (0, 1, 127, 128, 200, 255):
        p = encode_jpeg_progressive(8, 8, bytes([v]) * 64)
        assert decode_jpeg(p) == (8, 8, 1, bytes([v]) * 64)
    for v in (0, 77, 255):
        p = encode_jpeg_progressive(
            16, 16, bytes([v, v, v]) * 256, gray=False, subsampling="420"
        )
        assert decode_jpeg(p) == (16, 16, 3, bytes([v, v, v]) * 256)


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_progressive_decodes_identically_to_baseline(data):
    """Progressive entropy coding is LOSSLESS on quantized coefficients:
    once all six scans land, the coefficient store equals what one
    baseline scan carries, so the decodes are bit-identical — for any
    image, any quant, any band split, gray or color, 4:4:4 or 4:2:0,
    MCU-unaligned dims included. This is the cross-form certification
    the sf-scale oracle query leans on."""
    w = data.draw(st.integers(1, 24))
    h = data.draw(st.integers(1, 24))
    quant = data.draw(st.sampled_from([1, 2, 3, 8, 16]))
    split = data.draw(st.sampled_from([1, 5, 20, 62]))
    gray = data.draw(st.booleans())
    sub = "444" if gray else data.draw(st.sampled_from(["444", "420"]))
    n = w * h * (1 if gray else 3)
    px = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n)))
    base = decode_jpeg(encode_jpeg(
        w, h, px, gray=gray, quant=quant, subsampling=sub))
    prog = decode_jpeg(encode_jpeg_progressive(
        w, h, px, gray=gray, quant=quant, subsampling=sub, split=split))
    assert prog == base


def test_progressive_long_eob_runs():
    """A large solid image makes every AC band block all-zero, forcing
    accumulated EOBn runs (here 256 blocks -> EOB runs with extra
    bits) through both encoder chunking and decoder run consumption."""
    px = bytes([55]) * (128 * 128)
    assert decode_jpeg(encode_jpeg_progressive(128, 128, px))[3] == px


def test_progressive_refusals_are_loud():
    """Malformed progressive streams refuse with ValueError: truncated
    scans, huge declared dims (the allocation guard), arithmetic
    progressive (SOF10), bad successive-approximation headers."""
    good = encode_jpeg_progressive(8, 8, bytes(range(64)))
    with pytest.raises(ValueError):
        decode_jpeg(good[:-10])

    # dims forged to 65535x65535 after encoding: the coefficient-store
    # allocation guard must refuse before allocating ~8e9 block slots
    forged = bytearray(good)
    sof = forged.index(b"\xff\xc2")
    struct.pack_into(">HH", forged, sof + 5, 65535, 65535)
    with pytest.raises(ValueError, match="blocks"):
        decode_jpeg(bytes(forged))

    # arithmetic-coded progressive (SOF10 = 0xCA) refuses at the frame
    arith = bytearray(good)
    arith[sof + 1] = 0xCA
    with pytest.raises(ValueError):
        decode_jpeg(bytes(arith))

    # the ABSOLUTE cap (r12 ADVICE): dims whose block count clears the
    # proportional n_blocks/8-entropy-bytes guard but exceeds
    # PROG_BLOCK_CAP must still refuse — a ~512 KB forged payload must
    # not buy multi-GB of boxed-int coefficient store
    from user_feed_cdc_spark.operators.jpeg import (
        PROG_BLOCK_CAP,
        _alloc_prog_coefs,
    )

    frame = (4160, 4160, [(1, 0, 1, 1)])  # 270,400 blocks > 1<<18
    assert 520 * 520 > PROG_BLOCK_CAP
    with pytest.raises(ValueError, match="allocation cap"):
        _alloc_prog_coefs(bytes(300_000), 0, frame)

    # Ah must be 0 (first) or Al+1 (refinement): corrupt the first SOS
    bad = bytearray(good)
    sos = bad.index(b"\xff\xda")
    ns = bad[sos + 4]
    bad[sos + 7 + 2 * ns] = 0x75  # Ah=7 with Al=5
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_progressive_survives_arbitrary_corruption(data):
    """The untrusted-bytes contract holds for multi-scan streams too:
    corrupted or truncated progressive payloads decode or raise
    ValueError — never another exception class."""
    good = bytearray(encode_jpeg_progressive(16, 16, bytes(range(256))))
    if data.draw(st.booleans()):
        for _ in range(data.draw(st.integers(1, 5))):
            i = data.draw(st.integers(0, len(good) - 1))
            good[i] = data.draw(st.integers(0, 255))
    else:
        good = good[: data.draw(st.integers(0, len(good) - 1))]
    try:
        out = decode_jpeg(bytes(good))
        assert len(out[3]) == out[0] * out[1] * out[2]
    except ValueError:
        pass


def test_progressive_restart_markers():
    """The progressive scan loops handle DRI restart intervals: DC
    prediction resets at every RSTn in a DC first scan, and the AC
    end-of-band run resets in a non-interleaved AC scan. The stream is
    hand-framed (two 8x8 blocks, interval 1, RST0 between blocks in
    BOTH scans) so the decoder's marker alignment — not the encoder —
    is what's under test; a decoder that failed to reset the DC
    predictor would double the second block's level and shift its
    pixels."""
    import struct as _struct

    from user_feed_cdc_spark.operators.jpeg import (
        _BitWriter,
        _canonical_codes,
        _category,
        _ENC_DC_BITS,
        _ENC_DC_VALS,
        _PROG_AC_BITS,
        _PROG_AC_VALS,
    )

    v = 200  # solid level; DC = 8*(v-128) = 576 exactly at quant=1
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    def dc_unit(bw, diff):
        cat = _category(diff)
        code, length = dc_codes[cat]
        bw.write(code, length)
        if cat:
            bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc2" + _struct.pack(">H", 11)  # SOF2: 8 high, 16 wide
    out += _struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    dht = bytearray()
    dht += bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    dht += bytes([0x10]) + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS)
    out += b"\xff\xc4" + _struct.pack(">H", 2 + len(dht)) + dht
    out += b"\xff\xdd" + _struct.pack(">HH", 4, 1)  # DRI: interval 1

    # scan 1: DC first (Ss=Se=0, Ah=Al=0), RST0 between the two blocks;
    # the predictor resets, so BOTH blocks code the full diff 576
    out += b"\xff\xda" + _struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 0, 0])
    bw = _BitWriter()
    dc_unit(bw, 576)
    out += bw.flush() + b"\xff\xd0"
    bw = _BitWriter()
    dc_unit(bw, 576)
    out += bw.flush()

    # scan 2: AC first (Ss=1..63), all-zero band -> EOB0 per block with
    # a restart between (the eobrun must reset across it)
    out += b"\xff\xda" + _struct.pack(">H", 8) + bytes(
        [1, 1, 0x00, 1, 63, 0]
    )
    ec, el = ac_codes[0x00]
    bw = _BitWriter()
    bw.write(ec, el)
    out += bw.flush() + b"\xff\xd1"
    bw = _BitWriter()
    bw.write(ec, el)
    out += bw.flush()
    out += b"\xff\xd9"

    assert decode_jpeg(bytes(out)) == (16, 8, 1, bytes([v]) * 128)

    # a wrong/missing restart marker refuses
    broken = bytes(out).replace(b"\xff\xd0", b"\xff\xc8", 1)
    with pytest.raises(ValueError):
        decode_jpeg(broken)
