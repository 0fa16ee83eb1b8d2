"""PNG codec tests (operators/png.py): encode→decode round trips over
all five scanline filters, loud refusals for everything outside the
8-bit greyscale/RGB profile, untrusted-bytes allocation guards, and
the shared image dispatch (decode_image) routing PNGs by magic."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from user_feed_cdc_spark.operators.png import (
    PNG_PIXEL_CAP,
    PNG_SIGNATURE,
    _chunk,
    decode_png,
    encode_png,
)


def test_round_trip_all_filters_all_colour_types():
    """Each filter type on every row position, across the full 8-bit
    colour-type matrix (grey, RGB, grey+alpha, RGBA): forward filter
    and reconstruction must be exact inverses at every bpp."""
    for ct, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        w, h = 5, 5
        px = bytes((i * 37 + 11) % 256 for i in range(w * h * ch))
        for ft in range(5):
            enc = encode_png(w, h, px, color_type=ct, row_filters=[ft] * h)
            assert decode_png(enc) == (w, h, px), (ct, ft)


def test_palette_round_trip_expands_plte():
    """Colour type 3: index bytes ride the scanline filters, decode
    expands through the PLTE to RGB — the decode_gif contract."""
    pal = bytes((i * 11 + 3) % 256 for i in range(3 * 7))
    idx = bytes([0, 6, 3, 2, 5, 1, 4, 0, 6, 3, 2, 5])
    for interlace in (False, True):
        enc = encode_png(
            4, 3, idx, color_type=3, palette=pal, interlace=interlace
        )
        w, h, px = decode_png(enc)
        assert (w, h) == (4, 3)
        assert px == b"".join(pal[3 * i : 3 * i + 3] for i in idx)


def test_palette_trns_expands_to_rgba():
    """Palette + tRNS alpha table decodes to RGBA; entries past the
    table's end default to opaque 255 (spec §11.3.2)."""
    pal = bytes(range(3 * 4))
    idx = bytes([0, 1, 2, 3, 3, 0])
    enc = encode_png(
        3, 2, idx, color_type=3, palette=pal, transparency=bytes([9, 200])
    )
    w, h, px = decode_png(enc)
    alpha = {0: 9, 1: 200, 2: 255, 3: 255}
    assert (w, h) == (3, 2)
    assert px == b"".join(
        pal[3 * i : 3 * i + 3] + bytes([alpha[i]]) for i in idx
    )
    # an oversized table refuses at encode AND decode
    with pytest.raises(ValueError, match="alpha byte per palette"):
        encode_png(
            3, 2, idx, color_type=3, palette=pal, transparency=bytes(5)
        )


def test_colour_key_trns_expands_alpha():
    """Grey/RGB colour-key tRNS (spec §11.3.2.1): exactly-matching
    pixels decode transparent and the image gains an alpha channel —
    grey -> grey+alpha, RGB -> RGBA — at 8 AND 16 bits (the key
    matches on FULL-depth samples, before any MSB reduction)."""
    px = bytes([65, 7, 90, 7, 7, 66, 91, 65])
    enc = encode_png(
        4, 2, px, grayscale=True, row_filters=[0, 2],
        transparency=struct.pack(">H", 7),
    )
    _, _, out = decode_png(enc)
    assert [(out[2 * i], out[2 * i + 1]) for i in range(8)] == [
        (65, 255), (7, 0), (90, 255), (7, 0),
        (7, 0), (66, 255), (91, 255), (65, 255),
    ]

    rgb = bytes(
        [7, 8, 9, 65, 66, 7, 7, 8, 65, 7, 8, 9, 66, 8, 9, 9, 8, 7]
    )
    enc = encode_png(
        3, 2, rgb, color_type=2, row_filters=[1, 4],
        transparency=struct.pack(">HHH", 7, 8, 9),
    )
    _, _, out = decode_png(enc)
    assert [out[4 * i + 3] for i in range(6)] == [0, 255, 255, 0, 255, 255]
    assert b"".join(out[4 * i : 4 * i + 3] for i in range(6)) == rgb

    # 16-bit: key matched on the full sample, exposed raw and reduced
    samples = [1000, 7, 2000, 7]
    px = b"".join(struct.pack(">H", s) for s in samples)
    enc = encode_png(
        2, 2, px, grayscale=True, depth=16, row_filters=[3, 4],
        transparency=struct.pack(">H", 7),
    )
    _, _, raw = decode_png(enc, raw16=True)
    assert [
        int.from_bytes(raw[2 * i : 2 * i + 2], "big") for i in range(8)
    ] == [1000, 65535, 7, 0, 2000, 65535, 7, 0]
    _, _, red = decode_png(enc)
    assert list(red) == [1000 >> 8, 255, 0, 0, 2000 >> 8, 255, 0, 0]


def test_colour_key_trns_out_of_range_refuses():
    """A tRNS colour-key sample above the bit-depth range is
    spec-invalid and must REFUSE (r14 ADVICE): masking it to the
    depth silently aliased e.g. key 0x0148 at depth 8 onto sample
    0x48, making real pixels transparent."""
    import pytest

    px = bytes([65, 7, 90, 7, 7, 66, 91, 65])
    enc = encode_png(
        4, 2, px, grayscale=True, row_filters=[0, 2],
        transparency=struct.pack(">H", 0x0148),  # > 255 at depth 8
    )
    with pytest.raises(ValueError, match="out of range"):
        decode_png(enc)


def test_16bit_round_trip_and_msb_reduction():
    """16-bit lanes on every non-palette colour type, sequential and
    Adam7, all five filters: raw16 decode reproduces the exact
    big-endian sample stream, and the default return reduces each
    sample to its MSB (spec §13.12) preserving the w*h*ch contract."""
    for ct, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        for interlace in (False, True):
            w, h = 5, 5
            samples = [
                (i * 977 + 13 * ct) % 65536 for i in range(w * h * ch)
            ]
            px = b"".join(struct.pack(">H", s) for s in samples)
            n_rows = (
                sum(
                    ph
                    for _x, _y, _dx, _dy, pw, ph in __import__(
                        "user_feed_cdc_spark.operators.png",
                        fromlist=["_adam7_passes"],
                    )._adam7_passes(w, h)
                )
                if interlace
                else h
            )
            filters = [(r * 3 + 1) % 5 for r in range(n_rows)]
            enc = encode_png(
                w, h, px, color_type=ct, depth=16,
                interlace=interlace, row_filters=filters,
            )
            w2, h2, raw = decode_png(enc, raw16=True)
            assert (w2, h2) == (w, h)
            assert raw == px, (ct, interlace)
            _, _, red = decode_png(enc)
            assert red == bytes(s >> 8 for s in samples), (ct, interlace)
            assert len(red) == w * h * ch  # every consumer's contract

    # 16-bit images respect the BYTE-denominated allocation cap
    ihdr = struct.pack(">IIBBBBB", 2000, 2000, 16, 6, 0, 0, 0)
    p = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"x" * 1000)
        + _chunk(b"IEND", b"")
    )
    assert 2000 * 2000 * 4 < PNG_PIXEL_CAP < 2000 * 2000 * 8
    with pytest.raises(ValueError, match="allocation cap"):
        decode_png(p)


def test_palette_expansion_respects_pixel_cap(monkeypatch):
    """The allocation cap must bound the EXPANDED palette output (x3
    RGB, x4 with tRNS), not the 1-byte/pixel index plane (r13 ADVICE):
    at IHDR time ctype 3 caps with the guaranteed x3 factor, and the
    exact x4 re-check fires before the RGBA expansion loop."""
    from user_feed_cdc_spark.operators import png as png_mod

    # IHDR-time: index plane would fit, guaranteed RGB expansion won't
    ihdr = struct.pack(">IIBBBBB", 3000, 3000, 8, 3, 0, 0, 0)
    p = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"x" * 1000)
        + _chunk(b"IEND", b"")
    )
    assert 3000 * 3000 * 1 < PNG_PIXEL_CAP < 3000 * 3000 * 3
    with pytest.raises(ValueError, match="allocation cap"):
        decode_png(p)

    # expansion-time: x3 fits the (shrunk) cap, tRNS's x4 must not —
    # the same image WITHOUT tRNS decodes fine under the same cap
    pal = bytes(range(3 * 4))
    idx = bytes((i % 4 for i in range(9 * 3)))
    monkeypatch.setattr(png_mod, "PNG_PIXEL_CAP", 100)
    assert 9 * 3 * 3 <= 100 < 9 * 3 * 4
    w, h, px = png_mod.decode_png(
        encode_png(9, 3, idx, color_type=3, palette=pal)
    )
    assert (w, h, len(px)) == (9, 3, 9 * 3 * 3)
    with pytest.raises(ValueError, match="palette expansion"):
        png_mod.decode_png(
            encode_png(
                9, 3, idx, color_type=3, palette=pal,
                transparency=bytes([9, 200]),
            )
        )


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_round_trip_random(data):
    """Sequential and Adam7 layouts, random filters per scanline:
    decode must reproduce the exact pixel stream either way (interlace
    is lossless layout)."""
    from user_feed_cdc_spark.operators.png import _adam7_passes

    gray = data.draw(st.booleans())
    ch = 1 if gray else 3
    w = data.draw(st.integers(1, 8))
    h = data.draw(st.integers(1, 8))
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * ch,
                max_size=w * h * ch,
            )
        )
    )
    interlace = data.draw(st.booleans())
    nlines = (
        sum(ph for *_, ph in _adam7_passes(w, h)) if interlace else h
    )
    fts = data.draw(
        st.lists(st.integers(0, 4), min_size=nlines, max_size=nlines)
    )
    enc = encode_png(
        w, h, px, grayscale=gray, row_filters=fts, interlace=interlace
    )
    assert decode_png(enc) == (w, h, px)
    if interlace:
        # layout equivalence: the interlaced and sequential encodings
        # of the same pixels decode identically
        assert decode_png(enc) == decode_png(
            encode_png(w, h, px, grayscale=gray)
        )


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_round_trip_random_16bit(data):
    """The 16-bit lanes under the same random treatment: any colour
    type, sequential or Adam7, random per-line filters — raw16 decode
    reproduces the exact big-endian sample stream, the default return
    is the per-sample MSB, and an optional grey/RGB colour key
    synthesizes alpha exactly where full samples match the key."""
    from user_feed_cdc_spark.operators.png import _adam7_passes

    ct = data.draw(st.sampled_from([0, 2, 4, 6]))
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    w = data.draw(st.integers(1, 6))
    h = data.draw(st.integers(1, 6))
    samples = data.draw(
        st.lists(
            st.integers(0, 65535),
            min_size=w * h * ch,
            max_size=w * h * ch,
        )
    )
    px = b"".join(struct.pack(">H", s) for s in samples)
    interlace = data.draw(st.booleans())
    nlines = (
        sum(ph for *_, ph in _adam7_passes(w, h)) if interlace else h
    )
    fts = data.draw(
        st.lists(st.integers(0, 4), min_size=nlines, max_size=nlines)
    )
    key = None
    if ct in (0, 2) and data.draw(st.booleans()):
        # colour-key drawn from the image's own pixels half the time so
        # matches actually occur
        if data.draw(st.booleans()):
            p = data.draw(st.integers(0, w * h - 1))
            key = tuple(samples[p * ch : (p + 1) * ch])
        else:
            key = tuple(
                data.draw(st.integers(0, 65535)) for _ in range(ch)
            )
    enc = encode_png(
        w, h, px, color_type=ct, depth=16, row_filters=fts,
        interlace=interlace,
        transparency=(
            b"".join(struct.pack(">H", k) for k in key)
            if key is not None
            else None
        ),
    )
    w2, h2, raw = decode_png(enc, raw16=True)
    assert (w2, h2) == (w, h)
    got = [
        int.from_bytes(raw[2 * i : 2 * i + 2], "big")
        for i in range(len(raw) // 2)
    ]
    if key is None:
        assert got == samples
        _, _, red = decode_png(enc)
        assert list(red) == [s >> 8 for s in samples]
    else:
        expect = []
        for p in range(w * h):
            pix = samples[p * ch : (p + 1) * ch]
            expect += pix
            expect.append(0 if tuple(pix) == key else 65535)
        assert got == expect


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_round_trip_random_bit_packed(data):
    """Bit-packed depths 1/2/4 (grey and palette), sequential or
    Adam7, random per-line filters: filters run on the PACKED bytes,
    so reconstruction and MSB-first unpacking must both be exact —
    grey rescales by the exact 255/85/17 multiplier, palette indices
    expand through the PLTE (with an optional tRNS alpha table)."""
    from user_feed_cdc_spark.operators.png import _adam7_passes

    depth = data.draw(st.sampled_from([1, 2, 4]))
    mask = (1 << depth) - 1
    ct = data.draw(st.sampled_from([0, 3]))
    w = data.draw(st.integers(1, 10))
    h = data.draw(st.integers(1, 6))
    samples = bytes(
        data.draw(
            st.lists(
                st.integers(0, mask), min_size=w * h, max_size=w * h
            )
        )
    )
    interlace = data.draw(st.booleans())
    nlines = (
        sum(ph for *_, ph in _adam7_passes(w, h)) if interlace else h
    )
    fts = data.draw(
        st.lists(st.integers(0, 4), min_size=nlines, max_size=nlines)
    )
    if ct == 0:
        enc = encode_png(
            w, h, samples, grayscale=True, depth=depth,
            row_filters=fts, interlace=interlace,
        )
        mult = 255 // mask
        assert decode_png(enc) == (w, h, bytes(v * mult for v in samples))
    else:
        pal = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=3 * (mask + 1),
                    max_size=3 * (mask + 1),
                )
            )
        )
        trns = None
        if data.draw(st.booleans()):
            trns = bytes(
                data.draw(
                    st.lists(
                        st.integers(0, 255), min_size=1,
                        max_size=mask + 1,
                    )
                )
            )
        enc = encode_png(
            w, h, samples, color_type=3, depth=depth, palette=pal,
            transparency=trns, row_filters=fts, interlace=interlace,
        )
        _, _, px = decode_png(enc)
        expect = bytearray()
        for i in samples:
            expect += pal[3 * i : 3 * i + 3]
            if trns is not None:
                expect.append(trns[i] if i < len(trns) else 255)
        assert px == bytes(expect)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_survives_arbitrary_corruption(data):
    """Corrupt any byte / truncate anywhere: decode either succeeds or
    raises ValueError — never hangs, never raises anything else (the
    untrusted-bytes contract all the media decoders share)."""
    good = encode_png(4, 3, bytes(range(36)), row_filters=[0, 3, 4])
    mode = data.draw(st.sampled_from(["flip", "truncate", "garbage"]))
    if mode == "flip":
        i = data.draw(st.integers(0, len(good) - 1))
        bad = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1 :]
    elif mode == "truncate":
        bad = good[: data.draw(st.integers(0, len(good) - 1))]
    else:
        bad = bytes(
            data.draw(st.lists(st.integers(0, 255), min_size=0, max_size=64))
        )
    try:
        w, h, px = decode_png(bad)
        assert len(px) in (w * h, w * h * 3)
    except ValueError:
        pass


def test_refusals_are_loud():
    good = encode_png(4, 3, bytes(range(36)))

    # chunk CRC failure
    bad = bytearray(good)
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))

    # unknown interlace method (2) refuses; Adam7 (1) is SUPPORTED
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 2)
    p = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(39), 0))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlace method"):
        decode_png(p)

    # 16-bit depth, invalid colour type, tRNS transparency
    for depth, ctype, msg in (
        (3, 0, "invalid PNG bit depth"),  # non-power-of-two depth
        (4, 2, "greyscale/palette"),      # sub-byte RGB is spec-illegal
        (2, 6, "greyscale/palette"),      # ... and sub-byte RGBA
        (8, 5, "colour type"),
        (16, 3, "1/2/4/8"),               # 16-bit palette is spec-illegal
    ):
        ihdr = struct.pack(">IIBBBBB", 4, 3, depth, ctype, 0, 0, 0)
        p = PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError, match=msg):
            decode_png(p)
    # tRNS on ALPHA colour types is spec-illegal (they carry alpha
    # already); a colour-key of the wrong byte length also refuses
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)
    p = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"tRNS", bytes(2))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="invalid for alpha"):
        decode_png(p)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    p = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"tRNS", bytes(4))  # RGB key must be 6 bytes
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="must be 6 bytes"):
        decode_png(p)

    # palette index past the PLTE refuses at expansion, not mis-reads
    good_pal = encode_png(
        2, 2, bytes([0, 1, 1, 0]), color_type=3, palette=bytes(9)
    )
    # shrink the palette to one entry and re-checksum the chunk
    i = good_pal.index(b"PLTE") - 4
    shrunk = (
        good_pal[: i]
        + _chunk(b"PLTE", bytes(3))
        + good_pal[i + 12 + 9 :]
    )
    with pytest.raises(ValueError, match="index out of range"):
        decode_png(shrunk)

    # forged dims: the absolute cap fires before any allocation
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    p = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"x" * 1000)
        + _chunk(b"IEND", b"")
    )
    assert 60000 * 60000 * 3 > PNG_PIXEL_CAP
    with pytest.raises(ValueError, match="allocation cap"):
        decode_png(p)

    # dims within the cap but beyond what the payload could inflate to
    ihdr = struct.pack(">IIBBBBB", 2000, 2000, 8, 0, 0, 0, 0)
    p = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"x" * 8)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="cannot inflate"):
        decode_png(p)

    # IDAT inflating to the wrong length (one row short)
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0)
    p = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(2 * 5), 0))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflates to"):
        decode_png(p)

    # zip-bomb shape: IDAT inflating PAST the declared dims
    p = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(10_000), 9))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflates to"):
        decode_png(p)


def test_shared_dispatch_routes_by_magic():
    """decode_image sniffs GIF / PNG / BMP and all three decode the
    same pixel content to the same bytes — the container-agnostic
    contract the shared media fixtures rely on."""
    from user_feed_cdc_spark.operators.multimodal import (
        DecodeError,
        IMG_H,
        IMG_W,
        decode_image,
        encode_bmp,
    )

    content = bytes((i * 7) % 256 for i in range(IMG_W * IMG_H * 3))
    png = encode_png(IMG_W, IMG_H, content, row_filters=[1, 2, 3, 4][:IMG_H])
    bmp = encode_bmp(IMG_W, IMG_H, content)
    assert decode_image(png) == decode_image(bmp) == (IMG_W, IMG_H, content)

    # corrupt payloads normalize to DecodeError at the boundary
    with pytest.raises(DecodeError):
        decode_image(PNG_SIGNATURE + b"\x00" * 16)
