"""Pure-stdlib PNG codec (RFC 2083 / ISO 15948) for the multimodal
Python tier: the COMPLETE depth/colour-type matrix — greyscale (0),
truecolour RGB (2), palette (3, expanded through PLTE like the GIF
decoder), grey+alpha (4), RGBA (6); 16-bit lanes on 0/2/4/6 and
bit-packed 1/2/4 lanes on 0/3 (filters on packed bytes, MSB-first
unpack, exact 255/85/17 grey rescale) — all five scanline filters
(None/Sub/Up/Average/Paeth), Adam7 interlaced AND sequential
layouts, CRC-validated chunk walk, zlib inflate with a zip-bomb
bound.

PNG is the single most common image format in a web-scraped corpus
(r12 VERDICT gap 1); this closes the codec matrix the same way the
progressive-JPEG arc did: a real decoder for the common profile,
loud refusals only for spec-ILLEGAL combinations (sub-byte RGB/
alpha types, 16-bit palette, tRNS on alpha types),
and a fixture ENCODER whose IDAT uses zlib stored-mode blocks
(``zlib.compress(level=0)``, BTYPE=00 verbatim bytes) so the DuckDB
oracle can derive every decoded byte symbolically — the
`multimodal_phash_dedup` / `multimodal_audio_stats` oracle pattern.

Reference parity note: the reference system (user-feed CDC relay,
services/* — no media path at all) has no counterpart; this module
exists for the north-star multimodal corpus operators (SURVEY.md
§2.3 E5).

Scale posture: decode happens ONLY inside Arrow-batched mapInPandas
stages over payloads that never shuffle raw; untrusted dimensions are
validated against both a proportional payload bound and an absolute
allocation cap BEFORE any buffer is sized (the jpeg.py contract).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# Absolute ceiling on decoded pixel bytes (width * height * channels).
# 1<<24 = a 2048x2048 RGBA-class frame — far beyond the thumbnail/
# frame workloads this Python tier decodes; bigger media belongs to
# the external-decoder plug point (the jpeg.PROG_BLOCK_CAP rationale).
PNG_PIXEL_CAP = 1 << 24

# colour type -> samples per pixel: 0 greyscale, 2 truecolour RGB,
# 3 palette indices (expanded through PLTE at decode), 4 grey+alpha,
# 6 RGBA — the full 8-bit colour-type matrix a web corpus carries.
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid (spec §8.2): (x_start, y_start, x_step, y_step).
# Each pass is an independently-filtered sub-image; empty passes
# (zero width or height) contribute no bytes at all.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_passes(width: int, height: int):
    """Yield (x0, y0, dx, dy, pass_w, pass_h) for each NON-EMPTY pass."""
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            yield x0, y0, dx, dy, pw, ph


def _chunk(kind: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + kind
        + body
        + struct.pack(">I", zlib.crc32(kind + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    grayscale: bool = False,
    row_filters: list[int] | None = None,
    interlace: bool = False,
    color_type: int | None = None,
    palette: bytes | None = None,
    transparency: bytes | None = None,
    depth: int = 8,
) -> bytes:
    """Build a real PNG. ``pixels`` is the UNFILTERED top-down pixel
    stream (width*height*channels*(depth//8) bytes; 16-bit samples are
    BIG-ENDIAN byte pairs per spec §7.1). ``row_filters`` assigns a
    filter type per scanline — image rows for a sequential PNG, the
    concatenated per-pass rows for an Adam7 one; each line is then
    FORWARD-filtered per the spec so the decoder's unfilter path is
    genuinely exercised. The IDAT is deflated at level 0 —
    stored-mode blocks, verbatim scanline bytes — which is what lets
    symbolic oracles predict the compressed payload's decoded content
    without running inflate. ``interlace=True`` lays the stream out
    as the seven Adam7 passes, each an independently-filtered
    sub-image of the SAME pixels (interlacing is lossless layout, so
    a fixture's oracle is unchanged by it). ``color_type`` overrides
    the grayscale flag for the full matrix (0/2/3/4/6); palette
    images (3) take ``pixels`` as index bytes plus a ``palette`` of
    RGB triples emitted as the PLTE chunk."""
    if color_type is None:
        color_type = 0 if grayscale else 2
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported colour type {color_type}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    if depth == 16 and color_type == 3:
        raise ValueError("palette images allow depths 1/2/4/8 only")
    if depth < 8 and color_type not in (0, 3):
        raise ValueError(
            f"bit depth {depth} is only valid for greyscale/palette "
            "(spec table 11.1)"
        )
    ch = _CHANNELS[color_type]
    if color_type == 3:
        if not palette or len(palette) % 3 or len(palette) > 768:
            raise ValueError("palette images need 1-256 RGB triples")
        if pixels and max(pixels) * 3 >= len(palette):
            raise ValueError("palette index out of range")
    elif palette is not None:
        raise ValueError("palette is only valid for colour type 3")
    if transparency is not None:
        # ctype 3: per-entry alpha table; ctype 0: one 16-bit grey
        # sample key (2 bytes); ctype 2: one RGB sample key (6 bytes).
        # Alpha colour types carry their own alpha — tRNS is illegal.
        if color_type == 3:
            if len(transparency) > len(palette or b"") // 3:
                raise ValueError(
                    "transparency (tRNS) takes at most one alpha byte "
                    "per palette entry of a colour-type-3 image"
                )
        elif color_type in (0, 2):
            want = 2 if color_type == 0 else 6
            if len(transparency) != want:
                raise ValueError(
                    f"colour-key tRNS for colour type {color_type} is "
                    f"{want} bytes (16-bit sample value(s)), got "
                    f"{len(transparency)}"
                )
        else:
            raise ValueError(
                "tRNS is invalid for alpha colour types (4/6)"
            )
    if depth < 8:
        # bit-packed lanes: `pixels` is ONE BYTE PER SAMPLE (values
        # 0..2^depth-1, the unpacked form); rows pack MSB-first per
        # spec §7.2, each scanline independently byte-padded
        mask = (1 << depth) - 1
        if len(pixels) != width * height:
            raise ValueError(
                f"pixel stream is {len(pixels)} samples, expected "
                f"{width * height}"
            )
        if pixels and max(pixels) > mask:
            raise ValueError(
                f"sample exceeds {depth}-bit range 0..{mask}"
            )
        lines = []
        if interlace:
            for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
                for j in range(ph):
                    y = y0 + j * dy
                    lines.append(
                        (
                            _pack_bits(
                                [
                                    pixels[y * width + x0 + i * dx]
                                    for i in range(pw)
                                ],
                                depth,
                            ),
                            j == 0,
                        )
                    )
        else:
            lines = [
                (
                    _pack_bits(
                        pixels[r * width : (r + 1) * width], depth
                    ),
                    r == 0,
                )
                for r in range(height)
            ]
        unit = 1  # filter offset is one byte for sub-byte depths
    else:
        unit = ch * (depth // 8)  # bytes/pixel (filter offset, §6.2)
        if len(pixels) != width * height * unit:
            raise ValueError(
                f"pixel stream is {len(pixels)} bytes, expected "
                f"{width * height * unit}"
            )
        stride = width * unit
        if interlace:
            lines = []
            for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
                for j in range(ph):
                    y = y0 + j * dy
                    row = b"".join(
                        pixels[
                            (y * width + x0 + i * dx) * unit :
                            (y * width + x0 + i * dx) * unit + unit
                        ]
                        for i in range(pw)
                    )
                    lines.append((row, j == 0))
        else:
            lines = [
                (pixels[r * stride : (r + 1) * stride], r == 0)
                for r in range(height)
            ]
    filters = row_filters or [0] * len(lines)
    if len(filters) != len(lines):
        raise ValueError(
            f"row_filters must name one filter per scanline "
            f"({len(lines)} lines, got {len(filters)})"
        )
    raw = bytearray()
    prev = b""
    for (row, first), ft in zip(lines, filters):
        if first:  # each pass (or the image) starts with a zero prior row
            prev = bytes(len(row))
        raw.append(ft)
        raw += _filter_row(row, prev, ft, unit)
        prev = row
    ihdr = struct.pack(
        ">IIBBBBB",
        width, height, depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    plte = _chunk(b"PLTE", palette) if color_type == 3 else b""
    trns = (
        _chunk(b"tRNS", transparency) if transparency is not None else b""
    )
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + plte
        + trns
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 0))
        + _chunk(b"IEND", b"")
    )


def _pack_bits(samples, depth: int) -> bytes:
    """Pack sub-byte samples MSB-first into scanline bytes (spec §7.2);
    the trailing partial byte zero-pads on the right."""
    per = 8 // depth
    out = bytearray((len(samples) + per - 1) // per)
    for i, v in enumerate(samples):
        out[i // per] |= v << (8 - depth * (i % per + 1))
    return bytes(out)


def _unpack_bits(row: bytes, n: int, depth: int) -> bytes:
    """Inverse of _pack_bits: the first `n` MSB-first sub-byte samples
    of a scanline, one byte per sample."""
    per = 8 // depth
    mask = (1 << depth) - 1
    return bytes(
        (row[i // per] >> (8 - depth * (i % per + 1))) & mask
        for i in range(n)
    )


def _filter_row(row: bytes, prev: bytes, ft: int, bpp: int) -> bytes:
    """Forward application of filter `ft` (encoder side)."""
    out = bytearray(len(row))
    for x, b in enumerate(row):
        a = row[x - bpp] if x >= bpp else 0  # left (Recon — row is raw)
        u = prev[x]  # up
        c = prev[x - bpp] if x >= bpp else 0  # upper-left
        if ft == 0:
            p = 0
        elif ft == 1:
            p = a
        elif ft == 2:
            p = u
        elif ft == 3:
            p = (a + u) >> 1
        elif ft == 4:
            p = _paeth(a, u, c)
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[x] = (b - p) & 0xFF
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (spec §6.6) — exact tie order matters."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes, raw16: bool = False) -> tuple[int, int, bytes]:
    """Decode an 8- or 16-bit PNG of any colour type — sequential OR
    Adam7 interlaced: signature, CRC-checked chunk walk, bounded
    inflate of the concatenated IDATs, and the five-filter scanline
    reconstruction (per pass, for interlaced streams, each pass an
    independent sub-image scattered back onto the canvas; filters
    offset by the BYTES-per-pixel unit, so 16-bit lanes reconstruct
    through the same path — spec §6.2). Returns (width, height,
    pixel bytes, top-down) — palette images expand through PLTE to
    RGB; alpha types keep their alpha bytes interleaved. 16-bit
    images return 8-bit bytes by default, each sample reduced to its
    MOST SIGNIFICANT byte (the spec §13.12 sample-depth rescale,
    keeping every shared-dispatch consumer's w*h*ch contract);
    ``raw16=True`` returns the full big-endian byte stream
    (w*h*ch*2) for exact-sample consumers. Bit-packed depths (1/2/4,
    grey/palette) unfilter on the packed bytes then unpack MSB-first;
    grey rescales by the exact 255/85/17 multiplier. Refuses loudly —
    never partially — on: bad signature/CRC, spec-illegal
    depth/colour-type combinations, declared dims exceeding the
    allocation cap or the proportional payload bound, palette
    indices past the PLTE, and IDAT that inflates to anything but
    exactly the layout's scanline-stream length."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    ch = 0
    depth = 8
    ctype = -1
    interlaced = False
    palette: bytes | None = None
    trns: bytes | None = None
    colour_key: tuple[int, ...] | None = None
    idat = bytearray()
    seen_end = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        kind = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {kind!r}")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(kind + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {kind!r} fails CRC")
        pos += 12 + length
        if kind == b"IHDR":
            if len(body) != 13:
                raise ValueError(
                    f"PNG IHDR is {len(body)} bytes, expected 13"
                )
            width, height, depth, ctype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"invalid PNG bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG colour type {ctype} "
                    "(grey/RGB/palette/grey-alpha/RGBA decode here)"
                )
            if depth == 16 and ctype == 3:
                raise ValueError(
                    "PNG palette images allow depths 1/2/4/8 only"
                )
            if depth < 8 and ctype not in (0, 3):
                raise ValueError(
                    f"PNG bit depth {depth} is only valid for "
                    "greyscale/palette (spec table 11.1)"
                )
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            interlaced = interlace == 1
            ch = _CHANNELS[ctype]
            # filter offset = BYTES per pixel, floored at one byte for
            # bit-packed depths (spec §6.2)
            bypp = max(1, ch * depth // 8)
            if width <= 0 or height <= 0:
                raise ValueError("PNG declares empty dimensions")
            # palette (ctype 3) scanlines carry 1 byte/pixel but the
            # decode ALWAYS expands through PLTE to >= 3 channels
            # (4 with a tRNS table — re-checked exactly once tRNS is
            # known), so cap the guaranteed expansion here, before any
            # allocation (r13 ADVICE); 16-bit lanes double the byte
            # cost and cap accordingly
            if width * height * (3 if ctype == 3 else bypp) > PNG_PIXEL_CAP:
                raise ValueError(
                    f"declared dims {width}x{height}x{ch} exceed the "
                    "PNG decoder's allocation cap"
                )
            # proportional untrusted-bytes guard: stored-mode deflate
            # costs >= 1 byte per 1032 output bytes even at max
            # compression ratio's theoretical bound is huge, but a
            # scanline stream of n bytes can never inflate from fewer
            # than n/1032 compressed bytes (deflate's 258:1 * window
            # re-reference bound) — refuse dims the remaining payload
            # cannot possibly satisfy before allocating
            # (Adam7 adds <= 6 extra filter bytes per row-octave, so
            # the sequential form is a valid lower bound either way)
            need = height * (1 + (width * ch * depth + 7) // 8)
            if (len(payload) - pos) * 1032 < need:
                raise ValueError(
                    f"declared dims {width}x{height} need {need} scanline "
                    "bytes but the remaining payload cannot inflate that far"
                )
        elif kind == b"IDAT":
            if width is None:
                raise ValueError("PNG IDAT before IHDR")
            idat += body
        elif kind == b"IEND":
            seen_end = True
            break
        elif kind == b"PLTE":
            if len(body) % 3 or not 3 <= len(body) <= 768:
                raise ValueError("PNG PLTE must hold 1-256 RGB triples")
            palette = bytes(body)
        elif kind == b"tRNS":
            # palette transparency: per-entry alpha table, at most one
            # byte per PLTE entry — decoded palette images then expand
            # to RGBA (missing tail entries default opaque, spec
            # §11.3.2). For grey (0) / RGB (2) colour types tRNS is a
            # COLOUR-KEY: one 16-bit sample value (pair/triple) whose
            # exactly-matching pixels decode as fully transparent —
            # the image expands to grey+alpha / RGBA (spec §11.3.2.1).
            # Alpha colour types (4/6) carry alpha already; tRNS there
            # is spec-illegal and refuses.
            if ctype == 3:
                if palette is None or len(body) > len(palette) // 3:
                    raise ValueError(
                        "PNG tRNS must follow PLTE with at most one "
                        "alpha byte per palette entry"
                    )
                trns = bytes(body)
            elif ctype in (0, 2):
                want = 2 if ctype == 0 else 6
                if len(body) != want:
                    raise ValueError(
                        f"PNG colour-key tRNS for colour type {ctype} "
                        f"must be {want} bytes, got {len(body)}"
                    )
                # stored as 16-bit sample values; a value above the
                # bit-depth range is spec-invalid and REFUSES (r14
                # ADVICE: masking it silently aliased an out-of-range
                # key onto a real in-range value, turning pixels
                # transparent — inconsistent with this codec's
                # refuse-loudly posture for malformed inputs)
                limit = (1 << depth) - 1
                colour_key = tuple(
                    struct.unpack_from(">H", body, 2 * i)[0]
                    for i in range(want // 2)
                )
                if any(v > limit for v in colour_key):
                    raise ValueError(
                        f"PNG tRNS colour-key sample out of range for "
                        f"bit depth {depth}: {colour_key}"
                    )
            else:
                raise ValueError(
                    "PNG tRNS is invalid for alpha colour types (4/6)"
                )
        # other ancillary chunks (tEXt, pHYs, ...) are skipped
    if width is None or not seen_end or not idat:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    bypp = max(1, ch * depth // 8)
    packed = depth < 8

    def _stride(w: int) -> int:
        return (w * ch * depth + 7) // 8

    stride = _stride(width)
    if interlaced:
        expect = sum(
            ph * (1 + _stride(pw))
            for _x0, _y0, _dx, _dy, pw, ph in _adam7_passes(width, height)
        )
    else:
        expect = height * (1 + stride)
    d = zlib.decompressobj()
    try:
        raw = d.decompress(bytes(idat), expect + 1)
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    if len(raw) != expect or d.decompress(b"", 1) or not d.eof:
        raise ValueError(
            f"PNG IDAT inflates to {len(raw)}+ bytes, expected exactly "
            f"{expect}"
        )
    # the canvas holds one byte per SAMPLE: filtered scanline bytes for
    # depths >= 8, unpacked sub-byte samples for bit-packed depths
    # (filters always ran on the PACKED bytes — spec §6.2)
    out = bytearray(height * (width if packed else stride))
    if interlaced:
        off = 0
        for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
            pstride = _stride(pw)
            prev = bytes(pstride)
            for j in range(ph):
                ft = raw[off]
                line = raw[off + 1 : off + 1 + pstride]
                off += 1 + pstride
                row = _unfilter_row(line, prev, ft, bypp)
                prev = row
                y = y0 + j * dy
                if packed:
                    samples = _unpack_bits(row, pw, depth)
                    for i in range(pw):
                        out[y * width + x0 + i * dx] = samples[i]
                else:
                    for i in range(pw):
                        x = x0 + i * dx
                        p = (y * width + x) * bypp
                        out[p : p + bypp] = row[i * bypp : (i + 1) * bypp]
    else:
        prev = bytes(stride)
        for r in range(height):
            ft = raw[r * (1 + stride)]
            line = raw[r * (1 + stride) + 1 : (r + 1) * (1 + stride)]
            row = _unfilter_row(line, prev, ft, bypp)
            if packed:
                out[r * width : (r + 1) * width] = _unpack_bits(
                    row, width, depth
                )
            else:
                out[r * stride : (r + 1) * stride] = row
            prev = row
    if packed and ctype == 0:
        # greyscale sub-byte samples rescale to 8-bit EXACTLY —
        # 255/(2^d - 1) is the integer 255/85/17 for d = 1/2/4 (spec
        # §13.12 left-bit replication); palette indices stay raw. The
        # colour key (raw sample domain) rescales with them so the
        # downstream expansion compares like with like.
        mult = 255 // ((1 << depth) - 1)
        out = bytearray(v * mult for v in out)
        if colour_key is not None:
            colour_key = (colour_key[0] * mult,)
        depth = 8  # downstream (colour-key sw/opaque) sees 8-bit
    elif packed:
        depth = 8  # palette indices expand below exactly like 8-bit
    if colour_key is not None:
        # colour-key expansion BEFORE any depth reduction (the key is
        # matched on full-depth samples): grey -> grey+alpha, RGB ->
        # RGBA; exactly-matching pixels get alpha 0, all others the
        # depth's full-scale opaque value. Adds a channel, so re-check
        # the expanded allocation against the cap first (the palette
        # rule, r13 ADVICE).
        sw = depth // 8
        if width * height * (ch + 1) * sw > PNG_PIXEL_CAP:
            raise ValueError(
                f"colour-key expansion {width}x{height}x{ch + 1} "
                "exceeds the PNG decoder's allocation cap"
            )
        opaque = (1 << depth) - 1
        expanded = bytearray()
        for p in range(width * height):
            px = out[p * bypp : (p + 1) * bypp]
            samples = tuple(
                int.from_bytes(px[s * sw : (s + 1) * sw], "big")
                for s in range(ch)
            )
            expanded += px
            a = 0 if samples == colour_key else opaque
            expanded += a.to_bytes(sw, "big")
        out = expanded
    if depth == 16 and not raw16:
        # spec §13.12 sample-depth rescale: 16->8 keeps the MOST
        # significant byte (floor(v*255/65535 + 0.5) == hi for all hi
        # when lo == hi's propagation band; the MSB form is the
        # standard streaming reduction and keeps the w*h*ch contract
        # every shared-dispatch consumer assumes)
        out = out[0::2]
    if ctype == 3:
        # indices expand through PLTE to RGB (the decode_gif
        # contract), or to RGBA when a tRNS alpha table is present
        # (missing tail entries default to opaque 255)
        if palette is None:
            raise ValueError("palette PNG without a PLTE chunk")
        # the IHDR cap ran with ch=1 (the index plane); expansion
        # multiplies the allocation by 3 (RGB) or 4 (tRNS -> RGBA), so
        # re-check the EXPANDED size against the same cap before the
        # loop sizes the buffer (r13 ADVICE — without this, palette
        # output could reach 4x the documented bound)
        exp = 4 if trns is not None else 3
        if width * height * exp > PNG_PIXEL_CAP:
            raise ValueError(
                f"palette expansion {width}x{height}x{exp} exceeds the "
                "PNG decoder's allocation cap"
            )
        if out and max(out) * 3 >= len(palette):
            raise ValueError("PNG palette index out of range")
        px = bytearray()
        for i in out:
            px += palette[3 * i : 3 * i + 3]
            if trns is not None:
                px.append(trns[i] if i < len(trns) else 255)
        return width, height, bytes(px)
    return width, height, bytes(out)


def _unfilter_row(line: bytes, prev: bytes, ft: int, bpp: int) -> bytes:
    """Inverse filter (decoder side, spec §6 Recon definitions)."""
    out = bytearray(len(line))
    for x, b in enumerate(line):
        a = out[x - bpp] if x >= bpp else 0
        u = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ft == 0:
            p = 0
        elif ft == 1:
            p = a
        elif ft == 2:
            p = u
        elif ft == 3:
            p = (a + u) >> 1
        elif ft == 4:
            p = _paeth(a, u, c)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[x] = (b + p) & 0xFF
    return bytes(out)
