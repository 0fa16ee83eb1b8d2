"""Multimodal column operators (SURVEY.md §2.3 E5 + north-star
multimodal): binary payload columns with typed struct metadata, and
Arrow-batched feature extraction via mapInPandas.

Design: media payloads are opaque ``BinaryType`` columns riding next to a
typed metadata struct (modality, byte_len, content digest) — the lake
idiom for image/audio/video corpora. The payload here is the document's
utf-8 bytes (this container has no media decode libs — see
``decode_media``), but every Spark-side mechanism is real: BinaryType
columns, struct metadata projection/pruning, JVM-side digesting
(sha2/octet length — no Python in the oracle-checked path), and the
mapInPandas Arrow batch plumbing for the Python-side feature extractor.

At 100 TB: payload bytes never shuffle in these plans — digests and
metadata are computed in the scan projection (narrow), aggregations group
on small derived columns, and mapInPandas streams Arrow batches without
materializing a partition in memory.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from user_feed_cdc_spark.operators.png import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
)
from user_feed_cdc_spark.sources.tables import fan_out, load_table

class DecodeError(ValueError):
    """Any failure to parse an untrusted media payload. The container
    decoders raise it directly for validated corruption and their
    boundary wrapper converts low-level walk errors (struct.error /
    IndexError / KeyError from e.g. a corrupt LZW table walk) into it —
    so the fallback handlers can catch EXACTLY "bad data" without also
    swallowing programming errors in the consuming featurize/resize/
    hash code (round-7 ADVICE: a regression there must stay loud)."""


def _decode_boundary(fn):
    """Decorator for the public decoders: anything the untrusted-bytes
    walk raises is, by definition at this boundary, a data error —
    normalize it to DecodeError so callers distinguish corrupt payloads
    from bugs in their own post-decode logic."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except DecodeError:
            raise
        except (ValueError, struct.error, IndexError, KeyError) as e:
            raise DecodeError(str(e) or type(e).__name__) from e

    return wrapper


# The one exception set every decode fallback catches. The contract is
# "unparseable payloads pass through, never fail the stage":
# DecodeError is the decoders' boundary-normalized data-error signal;
# NotImplementedError is the documented video/modality plug point.
# Deliberately NOT ValueError/IndexError/KeyError — those escaping the
# consuming code are bugs and must fail the stage loudly.
DECODE_FALLBACK_ERRORS = (
    NotImplementedError,
    DecodeError,
)

def ascii_seed(text: str) -> bytes:
    """Fixture-seed bytes for the media entries that key codec
    parameters off the document text's FIRST BYTES while their DuckDB
    oracles address the first CODE POINTS via ascii(substr(text,k,1)).
    Bytes and code points agree only for ASCII, so the equivalence is
    asserted here as a loud contract (r12 ADVICE) instead of a silent
    engine/oracle divergence on a non-ASCII corpus — and a code point
    above 255 would also break the bytes([v]) fixture encoders. Only
    the first three characters are ever indexed (seed indexes 0..2)."""
    head = text[:3]
    if not head or not head.isascii():
        raise ValueError(
            "media fixture seeds require an ASCII document head; got "
            f"{head!r} — make the oracle byte-based before admitting "
            "non-ASCII corpora to these entries"
        )
    return text.encode("utf-8")


QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


MODALITIES = ("image", "audio", "video")
FEATURE_DIM = 8


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → simulated multimodal rows: ``payload BINARY`` plus a
    typed ``meta STRUCT<modality, byte_len, content_sha>``. Modality is
    assigned deterministically (doc_id mod 3) so oracles can reproduce
    it. Everything is a narrow JVM-side projection over the scan."""
    payload = F.encode(F.col("text"), "UTF-8")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, MODALITIES[0])
        .when(F.col("doc_id") % 3 == 1, MODALITIES[1])
        .otherwise(MODALITIES[2])
    )
    return docs.select(
        "doc_id",
        "source",
        payload.alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.length(payload).alias("byte_len"),
            F.sha2(payload, 256).alias("content_sha"),
        ).alias("meta"),
    )


@_register(
    "multimodal_binary_stats",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS content_sha
    FROM documents
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item binary metadata: byte length + content digest of the
    payload, projected out of the metadata struct. Digesting happens
    JVM-side (sha2 over BinaryType) in the scan projection."""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    return mm.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.content_sha").alias("content_sha"),
    )


@_register(
    "multimodal_rollup",
    """
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           source,
           COUNT(*) AS n_items,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT sha256(text)) AS n_distinct_content
    FROM documents
    GROUP BY 1, 2
    """,
)
def multimodal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting per (modality, source): item count, raw byte
    volume, distinct-content count (exact-dup detection over binary
    payloads via the digest — the digest, not the payload, shuffles)."""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    return mm.groupBy(
        F.col("meta.modality").alias("modality"), "source"
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta.byte_len").alias("total_bytes"),
        F.countDistinct("meta.content_sha").alias("n_distinct_content"),
    )


FRAME_BYTES = 64  # simulated frame size
FRAME_STRIDE = 4  # sample every 4th frame


@_register(
    "multimodal_frame_sample",
    f"""
    SELECT doc_id, n_frames, n_sampled, first_frame_md5
    FROM (
        SELECT doc_id,
               CAST(CEIL(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
               CAST(CEIL(CEIL(octet_length(encode(text)) / {FRAME_BYTES}.0)
                         / {FRAME_STRIDE}.0) AS BIGINT) AS n_sampled,
               md5(substring(text, 1, {FRAME_BYTES})) AS first_frame_md5
        FROM documents
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the binary payload: treat the payload as a
    sequence of fixed-size frames, sample every FRAME_STRIDE-th, digest
    the first sampled frame — byte-slicing (substring over BinaryType)
    and digesting happen JVM-side; this is the plumbing a video pipeline
    runs before handing sampled frames to a Python decoder
    (decode_media). Narrow over the scan, payload bytes never shuffle.
    (Oracle note: DuckDB can't substring a BLOB, so the oracle slices
    the source STRING — equivalent here because the corpus is pure
    ASCII, verified octet_length == length at every SF; Spark slices
    the actual binary payload.)"""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    n_frames = F.ceil(F.col("meta.byte_len") / float(FRAME_BYTES))
    return mm.select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.ceil(n_frames / float(FRAME_STRIDE)).alias("n_sampled"),
        F.md5(F.expr(f"substring(payload, 1, {FRAME_BYTES})")).alias(
            "first_frame_md5"
        ),
    )


# --- real container codecs (pure stdlib: struct only) ----------------------
#
# The container has no PIL/soundfile/ffmpeg, but BMP, GIF (with a real
# LZW codec), RIFF/WAVE, and a raw-frame video container are simple
# enough to parse without them — so all three modalities take a REAL
# format-parser decode path over real container bytes, and the image
# path includes genuine compression. Compressed video (H.264-class)
# stays out of scope: RVID is the uncompressed raw-frame transport a
# decode cluster would produce, the same role raw RGB frames play after
# an ffmpeg demux step.

IMG_W, IMG_H = 8, 4  # synthetic image dims: 96 RGB bytes of content
WAV_RATE = 8000
VID_W, VID_H, VID_FPS = 4, 2, 12  # synthetic video frame dims: 24 RGB bytes


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Windows BMP, 24bpp BI_RGB: BITMAPFILEHEADER + BITMAPINFOHEADER +
    bottom-up rows padded to 4 bytes. `pixels` is width*height*3 bytes."""
    import struct

    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    img_size = (row_raw + pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 0, 0, 0, 0)
    rows = b"".join(
        pixels[r * row_raw : (r + 1) * row_raw] + b"\x00" * pad
        for r in range(height)
    )
    return header + rows


@_decode_boundary
def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a 24bpp uncompressed BMP: validate magic/bpp/compression,
    strip per-row padding, return (width, height, pixel bytes)."""
    import struct

    magic, _fsize, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hsize, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant bpp={bpp} compression={compression}")
    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    rows = [
        payload[offset + r * stride : offset + r * stride + row_raw]
        for r in range(abs(height))
    ]
    return width, abs(height), b"".join(rows)


def encode_wav(samples: list[int], rate: int = WAV_RATE) -> bytes:
    """RIFF/WAVE, PCM16 mono little-endian."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


@_decode_boundary
def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse RIFF/WAVE by walking chunks (not fixed offsets — real WAV
    files carry LIST/fact chunks before data). Returns (rate, samples)."""
    import struct

    riff, _size, wave = struct.unpack_from("<4sI4s", payload, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV variant")
        elif cid == b"data":
            samples = list(struct.unpack(f"<{clen // 2}h", body[: clen // 2 * 2]))
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, samples


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV wFormatTag 0x11) — the compressed-audio tier
# ---------------------------------------------------------------------------

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]
_ADPCM_BLOCK_ALIGN = 34  # 4-byte header + 30 nibble bytes = 61 samples
_ADPCM_SPB = (_ADPCM_BLOCK_ALIGN - 4) * 2 + 1


def _ima_step(pred: int, idx: int, code: int) -> tuple[int, int]:
    """One IMA ADPCM decode step (the IMA/DVI reference recurrence):
    reconstruct diff from the 4-bit code with the step>>3 bias, apply
    sign, clamp the predictor to int16, adapt the step index."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[code & 7]))
    return pred, idx


def encode_wav_adpcm(samples: list[int], rate: int = WAV_RATE) -> bytes:
    """Mono IMA ADPCM WAV (wFormatTag 0x11): 4 bits per sample in
    34-byte blocks — 4-byte block header (int16 initial predictor =
    the block's FIRST sample verbatim, uint8 step index, reserved) +
    30 nibble bytes (low nibble first), 61 samples per block. The
    encoder is the standard IMA quantizer (successive step>>k
    subtraction) tracking the decoder's reconstruction so drift never
    accumulates. Sample count must tile blocks exactly (fixtures
    control their own lengths; a `fact` chunk records the count).

    Exactness contract (the audio twin of the flat-JPEG-block rule): a
    CONSTANT block round-trips bit-exactly — the header carries the
    value verbatim, every delta quantizes to code 0, and at step
    index 0 the code-0 reconstruction adds step>>3 = 7>>3 = 0, with
    the index pinned at the 0 clamp. Pinned per value by pytest."""
    if len(samples) % _ADPCM_SPB:
        raise ValueError(
            f"sample count must tile {_ADPCM_SPB}-sample blocks"
        )
    blocks = bytearray()
    idx = 0  # step index carries ACROSS blocks (each header re-seeds
    # the decoder with it) — resetting per block forgets the adapted
    # step and costs ~2x RMS error on real signals, measured
    for b in range(0, len(samples), _ADPCM_SPB):
        block = samples[b : b + _ADPCM_SPB]
        pred = block[0]
        if not (-32768 <= pred <= 32767):
            raise ValueError("samples must be int16")
        blocks += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in block[1:]:
            step = _IMA_STEPS[idx]
            delta = s - pred
            code = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                code |= 4
                delta -= step
            if delta >= step >> 1:
                code |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                code |= 1
            pred, idx = _ima_step(pred, idx, code)  # track the decoder
            nibbles.append(code)
        for i in range(0, len(nibbles), 2):
            blocks.append(nibbles[i] | (nibbles[i + 1] << 4))
    n_blocks = len(samples) // _ADPCM_SPB
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, rate,
        rate * _ADPCM_BLOCK_ALIGN // _ADPCM_SPB,  # byte rate
        _ADPCM_BLOCK_ALIGN, 4,  # block align, bits per sample
        2, _ADPCM_SPB,  # cbSize, wSamplesPerBlock
    )
    fact = struct.pack("<I", len(samples))
    return (
        struct.pack(
            "<4sI4s",
            b"RIFF",
            4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(blocks),
            b"WAVE",
        )
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"fact", len(fact))
        + fact
        + struct.pack("<4sI", b"data", len(blocks))
        + bytes(blocks)
    )


@_decode_boundary
def decode_wav_adpcm(payload: bytes) -> tuple[int, list[int]]:
    """Decode a mono IMA ADPCM WAV (wFormatTag 0x11) — real compressed
    audio through the real algorithm (the r12 compressed-audio tier
    beside the video codecs): per 34-byte block, seed the predictor
    and step index from the block header, then run the IMA recurrence
    over 60 nibbles (low nibble of each byte first, per the IMA/DVI
    spec and every WAV implementation). The `fact` chunk's sample
    count trims block padding. PCM (format 1) stays with decode_wav;
    any other format tag, channel count, or a malformed block refuses
    with the usual untrusted-bytes ValueError contract. Returns
    (rate, samples)."""
    riff, _size, wave = struct.unpack_from("<4sI4s", payload, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data, fact_n, block_align = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, block_align, bits = (
                struct.unpack_from("<HHIIHH", body, 0)
            )
            if audio_fmt != 0x11 or channels != 1 or bits != 4:
                raise ValueError(
                    f"not mono IMA ADPCM (fmt={audio_fmt} ch={channels} "
                    f"bits={bits})"
                )
        elif cid == b"fact":
            (fact_n,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)
    if rate is None or data is None or block_align is None:
        raise ValueError("WAV missing fmt/data chunk")
    if block_align < 5 or len(data) % block_align:
        raise ValueError("ADPCM data does not tile its block align")
    samples: list[int] = []
    for b in range(0, len(data), block_align):
        pred, idx, _rsv = struct.unpack_from("<hBB", data, b)
        if idx > 88:
            raise ValueError("ADPCM step index out of range")
        samples.append(pred)
        for byte in data[b + 4 : b + block_align]:
            for code in (byte & 0x0F, byte >> 4):
                pred, idx = _ima_step(pred, idx, code)
                samples.append(pred)
    if fact_n is not None:
        if fact_n > len(samples):
            raise ValueError("fact count exceeds decoded samples")
        samples = samples[:fact_n]
    return rate, samples


def encode_rvid(
    width: int, height: int, frames: list[bytes], fps: int = VID_FPS
) -> bytes:
    """RVID raw-frame video container: fixed header (magic, dims, fps,
    frame count) followed by n_frames × width*height*3 raw 24bpp RGB
    frames — the uncompressed transport an ffmpeg demux/decode step
    emits. Every frame must be exactly width*height*3 bytes."""
    frame_bytes = width * height * 3
    for i, fr in enumerate(frames):
        if len(fr) != frame_bytes:
            raise ValueError(
                f"frame {i} is {len(fr)} bytes, expected {frame_bytes}"
            )
    header = struct.pack("<4sHHHI", b"RVID", width, height, fps, len(frames))
    return header + b"".join(frames)


@_decode_boundary
def decode_rvid(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an RVID container: validate magic and that the body holds
    exactly the declared frame count. Returns (width, height, fps,
    frames)."""
    magic, width, height, fps, n_frames = struct.unpack_from("<4sHHHI", payload, 0)
    if magic != b"RVID":
        raise ValueError("not an RVID payload")
    frame_bytes = width * height * 3
    body = payload[struct.calcsize("<4sHHHI") :]
    if len(body) != n_frames * frame_bytes:
        raise ValueError(
            f"RVID body is {len(body)} bytes, expected "
            f"{n_frames} x {frame_bytes}"
        )
    frames = [
        body[i * frame_bytes : (i + 1) * frame_bytes] for i in range(n_frames)
    ]
    return width, height, fps, frames


def encode_avi(
    width: int,
    height: int,
    frames: list[bytes],
    fps: int = VID_FPS,
    compression: bytes | None = None,
) -> bytes:
    """RIFF/AVI, one video stream: LIST hdrl (avih MainAVIHeader +
    LIST strl (strh 'vids' + strf BITMAPINFOHEADER)) + LIST movi of
    frame chunks — the standard container an uncompressed-video export
    or an ffmpeg `-c:v rawvideo` step produces (reference parity: the
    repo treats video as opaque binary + typed metadata; this is the
    real-format tier beside the RVID raw transport).

    Default (compression=None): uncompressed 24bpp DIB '00db' frames,
    biHeight written NEGATIVE (top-down DIB) so frame bytes are stored
    row 0 first matching the content-derivation order, rows padded to
    4 bytes like any DIB, every frame exactly width*height*3 bytes.

    compression=b'MJPG' (or any fourcc): strf biCompression carries
    the fourcc, frames are stored VERBATIM in '00dc' chunks (a
    compressed bitstream's chunk body is opaque — no stride, no
    padding discipline) — the container shape real MJPEG/H.264 AVIs
    have, used to certify that decode_avi refuses compressed codecs
    and the digest fallback engages (multimodal_codec_fallback)."""
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    frame_stored = (row_raw + pad) * height
    if compression is None:
        stored = []
        for i, fr in enumerate(frames):
            if len(fr) != width * height * 3:
                raise ValueError(
                    f"frame {i} is {len(fr)} bytes, "
                    f"expected {width * height * 3}"
                )
            stored.append(
                b"".join(
                    fr[r * row_raw : (r + 1) * row_raw] + b"\x00" * pad
                    for r in range(height)
                )
            )
    else:
        if len(compression) != 4:
            raise ValueError("compression must be a 4-byte fourcc")
        stored = list(frames)
        frame_stored = max((len(fr) for fr in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        frame_stored * fps,        # dwMaxBytesPerSec
        0, 0,                      # padding granularity, flags
        len(frames), 0, 1,         # total frames, initial frames, streams
        frame_stored,              # suggested buffer
        width, height, 0, 0, 0, 0,
    )
    handler = compression if compression is not None else b"DIB "
    bi_compression = (
        struct.unpack("<I", compression)[0] if compression is not None else 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", handler,
        0, 0, 0, 0,                # flags, priority, language, initial
        1, fps,                    # dwScale, dwRate (fps = rate/scale)
        0, len(frames),            # start, length (frames)
        frame_stored, 0, 0,        # buffer, quality, sample size
        0, 0, width & 0xFFFF, height & 0xFFFF,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, -height,        # negative = top-down DIB
        1, 24, bi_compression,     # planes, bpp, BI_RGB or codec fourcc
        frame_stored, 0, 0, 0, 0,
    )

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return (
            struct.pack("<4sI", fourcc, len(body))
            + body
            + (b"\x00" if len(body) % 2 else b"")  # RIFF word alignment
        )

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    frame_id = b"00db" if compression is None else b"00dc"
    movi = lst(b"movi", b"".join(chunk(frame_id, fr) for fr in stored))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def _walk_avi(
    payload: bytes,
) -> tuple[int, int, int, bool, int, int, bytes, list[bytes]]:
    """Shared RIFF/AVI container walk the way a real demuxer does —
    chunk by chunk, not fixed offsets (real AVIs carry JUNK/INFO/idx1
    chunks in arbitrary positions): validate 'RIFF'/'AVI ', read dims
    from avih, fps from strh dwRate/dwScale, pixel format from strf,
    and collect stream-0 '00db'/'00dc' frame chunk bodies from LIST
    movi. strf bytes past the 40-byte BITMAPINFOHEADER (the palette of
    an 8-bit stream) are returned verbatim as strf_extra. Chunk extents are validated against the ENCLOSING list's
    end (not just the payload), so a malformed length can't read
    sibling-list bytes; frames from other streams ('01dc' audio, a
    second video track) are skipped, never interleaved. Returns
    (width, height, fps, top_down, bpp, compression, strf_extra,
    raw_frames);
    codec-specific validation (BI_RGB stride vs MJPEG bitstreams) is
    the caller's job."""
    riff, _size, ftype = struct.unpack_from("<4sI4s", payload, 0)
    if riff != b"RIFF" or ftype != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    fps = top_down = None
    bpp = comp = None
    strf_dims = None
    strf_extra = b""
    raw_frames: list[bytes] = []
    in_video_strl = False  # the strl whose strh declared fccType 'vids'

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, fps, top_down, bpp, comp, strf_dims
        nonlocal in_video_strl, strf_extra
        while pos + 8 <= end:
            cid, clen = struct.unpack_from("<4sI", payload, pos)
            body_at = pos + 8
            if body_at + clen > end:  # bound by the ENCLOSING list
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(body_at + 4, body_at + clen)  # skip list fourcc
            elif cid == b"avih":
                _, _, _, _, _n, _, _, _, width, height = struct.unpack_from(
                    "<10I", payload, body_at
                )
                if width <= 0 or height <= 0:
                    raise ValueError(
                        f"non-positive avih dims {width}x{height}"
                    )
            elif cid == b"strh":
                fcc, _h, _f, _p, _l, _init, scale, rate = struct.unpack_from(
                    "<4s4sIHHIII", payload, body_at
                )
                # Scope header state to the VIDEO stream: a multi-stream
                # AVI (video+audio) carries an 'auds' strl whose strf is
                # a WAVEFORMATEX — parsing it as BITMAPINFOHEADER would
                # clobber bpp/comp/strf_dims with garbage (r10 ADVICE).
                in_video_strl = fcc == b"vids"
                if in_video_strl:
                    fps = rate // max(scale, 1)
            elif cid == b"strf":
                if in_video_strl:
                    _sz, bw, bh, _pl, bpp, comp = struct.unpack_from(
                        "<IiiHHI", payload, body_at
                    )
                    top_down = bh < 0
                    strf_dims = (bw, abs(bh))
                    strf_extra = payload[body_at + 40 : body_at + clen]
            elif cid[:2] == b"00" and cid[2:] in (b"db", b"dc"):
                # stream 00 = the declared video stream; other-stream
                # chunks (audio '01wb', a second track) never interleave
                raw_frames.append(payload[body_at : body_at + clen])
            pos = body_at + clen + (clen % 2)  # chunks are word-aligned

    walk(12, len(payload))
    if width is None or fps is None or top_down is None:
        raise ValueError("AVI missing avih/strh/strf header")
    if strf_dims is not None and strf_dims != (width, height):
        raise ValueError(
            f"avih dims {width}x{height} disagree with strf {strf_dims}"
        )
    return width, height, fps, top_down, bpp, comp, strf_extra, raw_frames


@_decode_boundary
def decode_avi(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Demux an UNCOMPRESSED-DIB RIFF/AVI (see _walk_avi for the
    container walk): requires 24bpp BI_RGB, strips per-row DIB
    padding, and un-flips bottom-up frames (positive biHeight) so
    callers always see row 0 first. Compressed codecs refuse here —
    decode_avi_mjpeg handles the MJPG arm, everything else takes the
    digest fallback. Returns (width, height, fps, frames)."""
    width, height, fps, top_down, bpp, comp, _pal, raw_frames = _walk_avi(
        payload
    )
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported AVI stream bpp={bpp} compression={comp}"
        )
    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    frames = []
    for fr in raw_frames:
        if len(fr) != stride * height:
            raise ValueError(
                f"AVI frame is {len(fr)} bytes, expected {stride * height}"
            )
        rows = [fr[r * stride : r * stride + row_raw] for r in range(height)]
        if not top_down:
            rows.reverse()
        frames.append(b"".join(rows))
    return width, height, fps, frames


_MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


@_decode_boundary
def decode_avi_mjpeg(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Demux an MJPEG RIFF/AVI and DECODE each '00dc' frame with the
    pure-stdlib baseline JPEG decoder (operators/jpeg.py) — the r09
    plug point made real: Motion-JPEG is just a baseline JPEG per
    frame in the same container decode_avi walks. Every frame must
    decode to the container's declared dims (a frame/header
    disagreement is corruption, not a resize); grayscale JPEGs
    replicate to RGB so callers always receive width*height*3 RGB
    bytes row-0-first, exactly like decode_avi. Non-MJPG compression
    still refuses — H.264-class inter-frame codecs remain the
    documented external-decoder plug point. Returns
    (width, height, fps, frames)."""
    from user_feed_cdc_spark.operators.jpeg import decode_jpeg

    width, height, fps, _td, _bpp, comp, _pal, raw_frames = _walk_avi(
        payload
    )
    if comp != _MJPG_FOURCC:
        raise ValueError(f"not an MJPEG AVI (compression={comp})")
    frames = []
    for fr in raw_frames:
        w, h, ncomp, samples = decode_jpeg(fr)
        if (w, h) != (width, height):
            raise ValueError(
                f"MJPEG frame {w}x{h} disagrees with container "
                f"{width}x{height}"
            )
        if ncomp == 1:
            rgb = bytearray(w * h * 3)
            for i, v in enumerate(samples):
                rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = v
            frames.append(bytes(rgb))
        else:
            frames.append(samples)
    return width, height, fps, frames


_RLE8_BI = 1  # BITMAPINFOHEADER biCompression BI_RLE8


def encode_avi_rle8(
    width: int,
    height: int,
    rle_frames: list[bytes],
    fps: int = VID_FPS,
) -> bytes:
    """RIFF/AVI container for an 8-bit BI_RLE8 video stream — the
    fixture builder for the INTER-FRAME decode path. Same container
    shape as encode_avi (LIST hdrl: avih + strl(strh 'vids' + strf),
    LIST movi of '00dc' chunks), but the strf is an 8bpp
    BITMAPINFOHEADER with biCompression=BI_RLE8, POSITIVE biHeight
    (RLE DIBs are bottom-up by spec — no top-down RLE exists), and a
    256-entry grayscale identity RGBQUAD palette (index v -> (v,v,v)).
    Frame chunk bodies are the caller's raw RLE8 opcode streams,
    stored verbatim."""
    if not (0 < width < 65536 and 0 < height < 65536):
        raise ValueError("bad RLE8 dims")
    buf = max((len(fr) for fr in rle_frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1), buf * fps, 0, 0,
        len(rle_frames), 0, 1, buf, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MRLE", 0, 0, 0, 0, 1, fps, 0, len(rle_frames),
        buf, 0, 0, 0, 0, width & 0xFFFF, height & 0xFFFF,
    )
    palette = b"".join(bytes([v, v, v, 0]) for v in range(256))  # BGRX
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height,  # POSITIVE: bottom-up, required for RLE
        1, 8, _RLE8_BI, buf, 0, 0, 256, 0,
    ) + palette

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return (
            struct.pack("<4sI", fourcc, len(body))
            + body
            + (b"\x00" if len(body) % 2 else b"")
        )

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", fr) for fr in rle_frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


# Shared two-frame RLE8 demo fixture (multimodal_video_rle8_delta_stats
# AND pipeline_multimodal_funnel certify against it): 16x16 keyframe of
# v0, then a P-frame that skips up 3 rows / right 4 cols and rewrites 7
# pixels of v1 (a 4-run + a word-padded 3-literal absolute run) before
# an early end-of-bitmap. Both oracles' closed-form constants and the
# probe offset derive from THIS geometry — one definition keeps the two
# entries and their oracles in lockstep.
RLE8_DEMO_SIDE = 16
RLE8_DEMO_CHANGED = 7
RLE8_DEMO_PROBE = (12 * RLE8_DEMO_SIDE + 4) * 3  # first rewritten pixel


def rle8_demo_avi(v0: int, v1: int) -> bytes:
    side = RLE8_DEMO_SIDE
    key = (
        b"".join(bytes([side, v0, 0, 0]) for _ in range(side - 1))
        + bytes([side, v0, 0, 1])
    )
    delta = (
        bytes([0, 2, 4, 3])              # delta: right 4, up 3
        + bytes([4, v1])                 # run of 4
        + bytes([0, 3, v1, v1, v1, 0])   # absolute 3 + pad
        + bytes([0, 1])                  # early end-of-bitmap
    )
    return encode_avi_rle8(side, side, [key, delta])


def _rle8_apply(
    data: bytes, width: int, height: int, prev: bytes | None
) -> bytearray:
    """Interpret one BI_RLE8 opcode stream onto the PREVIOUS frame's
    index buffer (bottom-up raster, row 0 = bottom — the DIB
    convention). This is where the codec is genuinely INTER-frame:
    end-of-line, delta (0x00 0x02 dx dy, dy moves UP the image), and
    early end-of-bitmap all leave the skipped pixels holding the prior
    frame's values, so a P-frame encodes only what changed. A
    keyframe is simply a stream whose runs cover every pixel. Opcodes
    per the Windows BMP/AVI spec: (n>0, v) = run; (0,0) = EOL; (0,1) =
    EOB; (0,2,dx,dy) = delta; (0,n>=3) = n absolute literals padded to
    a word boundary. Malformed streams (overflowing runs, truncated
    escapes, positions past the bitmap) raise ValueError."""
    fb = bytearray(prev) if prev is not None else bytearray(width * height)
    x = y = 0  # y counts bottom-up rows
    i = 0
    n = len(data)
    while True:
        if i + 2 > n:
            raise ValueError("truncated RLE8 stream (no end-of-bitmap)")
        a, b = data[i], data[i + 1]
        i += 2
        if a > 0:  # encoded run
            if y >= height or x + a > width:
                raise ValueError("RLE8 run overflows bitmap")
            base = y * width + x
            fb[base : base + a] = bytes([b]) * a
            x += a
        elif b == 0:  # end of line
            x = 0
            y += 1
            if y > height:
                raise ValueError("RLE8 EOL past last row")
        elif b == 1:  # end of bitmap
            return fb
        elif b == 2:  # delta: skip right dx, up dy (inherits prev)
            if i + 2 > n:
                raise ValueError("truncated RLE8 delta")
            dx, dy = data[i], data[i + 1]
            i += 2
            x += dx
            y += dy
            if x > width or y > height:
                raise ValueError("RLE8 delta past bitmap")
        else:  # absolute mode: b literal pixels, word-aligned
            if i + b > n:
                raise ValueError("truncated RLE8 absolute run")
            if y >= height or x + b > width:
                raise ValueError("RLE8 absolute run overflows bitmap")
            base = y * width + x
            fb[base : base + b] = data[i : i + b]
            x += b
            i += b + (b % 2)


@_decode_boundary
def decode_avi_rle8(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Demux a BI_RLE8 RIFF/AVI and decode its INTER-FRAME compressed
    stream — real temporal prediction in a real public codec (the r11
    VERDICT item 5 'inter-frame video' plug point, closed for the
    RLE8-class): frame k's opcode stream is applied ON TOP of frame
    k-1's reconstructed buffer (delta/EOL/early-EOB skips inherit
    prior pixels), exactly how Microsoft RLE P-frames reference their
    predecessor. Requires 8bpp, biCompression=1, bottom-up (positive
    biHeight — the only legal RLE orientation) and a 256-entry RGBQUAD
    palette in strf. Returns (width, height, fps, frames) with frames
    expanded through the palette to width*height*3 RGB bytes,
    row-0-first like every other decoder here. H.264-class
    motion-compensated codecs remain the external plug point
    (multimodal_codec_fallback)."""
    width, height, fps, top_down, bpp, comp, pal, raw_frames = _walk_avi(
        payload
    )
    if bpp != 8 or comp != _RLE8_BI:
        raise ValueError(
            f"not a BI_RLE8 AVI (bpp={bpp} compression={comp})"
        )
    if top_down:
        raise ValueError("RLE8 DIBs must be bottom-up (positive biHeight)")
    if len(pal) < 256 * 4:
        raise ValueError("BI_RLE8 stream missing its 256-entry palette")
    # RGBQUAD is B,G,R,reserved
    lut = [(pal[4 * v + 2], pal[4 * v + 1], pal[4 * v]) for v in range(256)]
    frames = []
    prev: bytearray | None = None
    for fr in raw_frames:
        fb = _rle8_apply(fr, width, height, prev)
        prev = fb
        rgb = bytearray(width * height * 3)
        for ty in range(height):
            src = (height - 1 - ty) * width  # un-flip bottom-up rows
            dst = ty * width * 3
            for tx in range(width):
                r, g, b = lut[fb[src + tx]]
                rgb[dst] = r
                rgb[dst + 1] = g
                rgb[dst + 2] = b
                dst += 3
        frames.append(bytes(rgb))
    return width, height, fps, frames


GIF_MAX_CODE = 4096  # 12-bit LZW cap (GIF spec)


def _lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-flavor LZW: variable-width codes starting at
    min_code_size+1 bits, LSB-first bit packing, CLEAR/EOI control
    codes, dictionary reset at the 12-bit cap. Paired with _lzw_decode
    (growth conditions derived for exact symmetry and pinned by
    boundary-crossing round-trip tests)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < GIF_MAX_CODE:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    bitbuf = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated LZW stream (no EOI)")
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt LZW stream: bad first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < GIF_MAX_CODE:
                table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            if len(table) < GIF_MAX_CODE:
                table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        # decoder table is one entry behind the encoder at read time,
        # so it widens one entry earlier than the encoder's condition
        if len(table) == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
        out += entry
        prev = entry


def encode_gif(width: int, height: int, gray: bytes) -> bytes:
    """GIF87a, one image, 256-entry grayscale global color table, pixel
    indices = gray levels, REAL LZW-compressed image data in ≤255-byte
    sub-blocks. `gray` is width*height bytes. The compressed-codec tier
    of the media matrix (BMP/WAV/RVID are uncompressed transports)."""
    if len(gray) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(gray)}")
    out = bytearray(b"GIF87a")
    # logical screen: GCT present, 8-bit color resolution, 256 entries
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW minimum code size
    lzw = _lzw_encode(gray, 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def encode_gif_animation(
    width: int, height: int, frames: list[dict]
) -> bytes:
    """GIF89a ANIMATION, 256-entry grayscale global table: a Netscape
    loop application extension, then per frame a Graphic Control
    Extension (disposal method bits 2-4, transparency flag bit 0,
    transparent index) followed by a SUB-RECTANGLE image descriptor
    and real LZW data. Each frame dict: left, top, w, h,
    indices (w*h bytes), disposal (0-3), transparent (index or None).
    The fixture builder for the animation composition decoder."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    # Netscape looping extension (exercises application-block skipping)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        left, top, w, h = fr["left"], fr["top"], fr["w"], fr["h"]
        if len(fr["indices"]) != w * h:
            raise ValueError("frame indices do not match its rect")
        if left + w > width or top + h > height:
            raise ValueError("frame rect outside logical screen")
        trans = fr.get("transparent")
        packed = (fr.get("disposal", 0) & 0x07) << 2
        if trans is not None:
            packed |= 0x01
        out += b"\x21\xf9\x04" + bytes([packed]) + struct.pack("<H", 2)
        out += bytes([trans if trans is not None else 0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        out.append(8)
        lzw = _lzw_encode(fr["indices"], 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


@_decode_boundary
def decode_gif_animation(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a GIF89a ANIMATION with the full composition model — the
    second real INTER-frame form beside Microsoft-RLE8: each image is
    a SUB-RECTANGLE drawn onto the logical canvas, transparent-index
    pixels INHERIT whatever the canvas already holds, and the PREVIOUS
    frame's disposal method is applied before drawing — 0/1 keep the
    canvas, 2 restores the previous rect to the background color, 3
    restores the canvas to its state before the previous frame drew
    (the undo disposal). Returns (width, height, frames) with one
    full-canvas RGB rendering per image, row-0-first — so a GIF
    animation's frames come out exactly like every other video
    decoder's. Extension blocks (Netscape loop, comments) are walked
    and skipped; interlacing refuses as in decode_gif; malformed
    rects/indices raise the usual untrusted-bytes ValueError."""
    if payload[:6] != b"GIF89a":
        raise ValueError("not a GIF89a payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    width, height, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        palette = payload[pos : pos + 3 * n]
        pos += 3 * n
    if palette is None or len(palette) < 3 * (bg + 1):
        raise ValueError("animation requires a global color table")
    canvas = bytearray([bg]) * (width * height)
    frames: list[bytes] = []
    pend_disposal = 0
    pend_transparent: int | None = None
    prev_disposal = 0
    prev_rect: tuple[int, int, int, int] | None = None
    snapshot: bytearray | None = None
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                blen = payload[pos]
                if blen != 4:
                    raise ValueError("malformed GCE block")
                gpacked = payload[pos + 1]
                pend_disposal = (gpacked >> 2) & 0x07
                pend_transparent = (
                    payload[pos + 4] if gpacked & 0x01 else None
                )
                pos += 1 + blen
                if payload[pos] != 0:
                    raise ValueError("unterminated GCE")
                pos += 1
            else:  # application/comment/plain-text: skip sub-blocks
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
        elif b0 == 0x2C:  # image descriptor
            left, top, iw, ih, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            if ipacked & 0x80:
                raise ValueError(
                    "local color tables unsupported in animations"
                )
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if left + iw > width or top + ih > height:
                raise ValueError("frame rect outside logical screen")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while True:
                blen = payload[pos]
                pos += 1
                if blen == 0:
                    break
                data += payload[pos : pos + blen]
                pos += blen
            idx = _lzw_decode(bytes(data), mcs)
            if len(idx) < iw * ih:
                raise ValueError("GIF frame data shorter than its rect")
            # apply the PREVIOUS frame's disposal before drawing
            if prev_rect is not None:
                if prev_disposal == 2:
                    pl, pt, pw, ph = prev_rect
                    for y in range(pt, pt + ph):
                        base = y * width
                        for x in range(pl, pl + pw):
                            canvas[base + x] = bg
                elif prev_disposal == 3 and snapshot is not None:
                    canvas = bytearray(snapshot)
            snapshot = bytearray(canvas)  # pre-draw state (disposal 3)
            i = 0
            for y in range(top, top + ih):
                base = y * width
                for x in range(left, left + iw):
                    v = idx[i]
                    i += 1
                    if v == pend_transparent:
                        continue  # inherit the canvas (inter-frame)
                    canvas[base + x] = v
            rgb = bytearray(width * height * 3)
            for j, v in enumerate(canvas):
                if 3 * v + 2 >= len(palette):
                    raise ValueError("pixel index outside color table")
                rgb[3 * j] = palette[3 * v]
                rgb[3 * j + 1] = palette[3 * v + 1]
                rgb[3 * j + 2] = palette[3 * v + 2]
            frames.append(bytes(rgb))
            prev_disposal = pend_disposal
            prev_rect = (left, top, iw, ih)
            pend_disposal = 0
            pend_transparent = None
        elif b0 == 0x3B:  # trailer
            saw_trailer = True
            break
        else:
            raise ValueError(f"unknown GIF block {b0:02x}")
    else:
        saw_trailer = False
    if not saw_trailer:
        # block-boundary truncation would otherwise return a silently
        # partial animation — the trailer is the integrity witness
        raise ValueError("GIF animation missing its trailer")
    if not frames:
        raise ValueError("GIF animation holds no image")
    return width, height, frames


@_decode_boundary
def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a non-interlaced GIF87a/89a: walk the block structure
    (skipping 0x21 extension blocks), LZW-decompress the first image's
    indices, expand through the active color table. Returns
    (width, height, rgb bytes)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    _w, _h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        palette = payload[pos : pos + 3 * n]
        pos += 3 * n
    try:
        while pos < len(payload):
            b0 = payload[pos]
            if b0 == 0x21:  # extension: label byte + sub-blocks
                pos += 2
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif b0 == 0x2C:  # image descriptor
                _l, _t, iw, ih, ipacked = struct.unpack_from(
                    "<HHHHB", payload, pos + 1
                )
                pos += 10
                if ipacked & 0x80:  # local color table wins
                    n = 2 ** ((ipacked & 0x07) + 1)
                    palette = payload[pos : pos + 3 * n]
                    pos += 3 * n
                if ipacked & 0x40:
                    raise ValueError("interlaced GIF unsupported")
                mcs = payload[pos]
                pos += 1
                data = bytearray()
                while True:
                    blen = payload[pos]
                    pos += 1
                    if blen == 0:
                        break
                    data += payload[pos : pos + blen]
                    pos += blen
                idx = _lzw_decode(bytes(data), mcs)
                if len(idx) != iw * ih:
                    raise ValueError(
                        f"GIF decoded {len(idx)} pixels, expected {iw * ih}"
                    )
                if palette is None:
                    raise ValueError("GIF image without a color table")
                rgb = bytearray()
                for i in idx:
                    rgb += palette[3 * i : 3 * i + 3]
                return iw, ih, bytes(rgb)
            elif b0 == 0x3B:
                break
            else:
                raise ValueError(f"corrupt GIF block 0x{b0:02x}")
    except IndexError as e:  # truncated mid-structure
        raise ValueError("truncated GIF body") from e
    raise ValueError("GIF carries no image descriptor")


@_decode_boundary
def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """THE image-container dispatch: sniff the magic bytes and route to
    the matching decoder — GIF87a/89a (LZW), PNG (zlib + scanline
    filters, operators/png.py), else 24bpp BMP. Every image consumer
    (decode_media, resize_media, the dHash pass) shares this one
    sniffer, so extending the codec matrix extends them all at once
    (r12 VERDICT: PNG coverage 'for free' through the dispatch)."""
    if payload[:3] == b"GIF":
        return decode_gif(payload)
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    return decode_bmp(payload)


def decode_media(payload: bytes, modality: str) -> list[int]:
    """Decode real container bytes into content units: GIF/PNG/BMP →
    pixel channel bytes (0..255), WAV → PCM16 samples, RVID video →
    concatenated frame pixel bytes. Unknown modalities raise (the
    caller's digest fallback handles them, flagged decoded=false)."""
    if modality == "image":
        # container sniffing by magic — image corpora mix formats
        _w, _h, pixels = decode_image(payload)
        return list(pixels)
    if modality == "audio":
        _rate, samples = decode_wav(payload)
        return samples
    if modality == "video":
        _w, _h, _fps, frames = decode_rvid(payload)
        return list(b"".join(frames))
    raise NotImplementedError(
        f"no decoder for modality {modality!r}; extract_features takes "
        "the digest fallback for it"
    )


def with_media_payload(docs: DataFrame) -> DataFrame:
    """documents → rows whose ``payload`` is a REAL media container:
    doc_id%3==0 → image, alternating LZW-compressed GIF87a (doc_id%6==0)
    and uncompressed 24bpp BMP — decode_media dispatches on the magic
    bytes, as an image pipeline must on a mixed corpus;
    doc_id%3==1 → PCM16 WAV (samples derived from the doc's bytes),
    else → RVID raw-frame video (frames = the doc's bytes split into
    VID_W×VID_H RGB frames). Built in an Arrow-batched mapInPandas
    pass — container assembly is Python-side by nature (it's what an
    ingestion job does once, at write time)."""
    import pandas as pd

    content_len = IMG_W * IMG_H * 3

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                content = (raw * (content_len // max(len(raw), 1) + 1))[:content_len]
                if doc_id % 3 == 0:
                    # image corpora mix formats: LZW-compressed GIF,
                    # zlib-filtered PNG, and uncompressed BMP rotate
                    # through the image slice — all three decode to
                    # the SAME pixel bytes (`content`), so every
                    # downstream consumer (and its oracle) is
                    # container-agnostic by construction
                    if doc_id % 6 == 0:
                        payloads.append(
                            encode_gif(
                                IMG_W, IMG_H, bytes(content[: IMG_W * IMG_H])
                            )
                        )
                    elif doc_id % 12 == 3:
                        # forward-filtered rows: the decoder's Sub/Up/
                        # Average/Paeth reconstruction runs inside the
                        # certified shared path, not just unit tests
                        payloads.append(
                            encode_png(
                                IMG_W, IMG_H, bytes(content),
                                row_filters=[1, 2, 3, 4][:IMG_H],
                            )
                        )
                    else:
                        payloads.append(encode_bmp(IMG_W, IMG_H, content))
                elif doc_id % 3 == 1:
                    payloads.append(encode_wav([(b - 128) * 256 for b in content]))
                else:
                    fb = VID_W * VID_H * 3
                    frames = [
                        bytes(content[i : i + fb])
                        for i in range(0, content_len, fb)
                    ]
                    payloads.append(encode_rvid(VID_W, VID_H, frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    built = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )
    modality = (
        F.when(F.col("doc_id") % 3 == 0, MODALITIES[0])
        .when(F.col("doc_id") % 3 == 1, MODALITIES[1])
        .otherwise(MODALITIES[2])
    )
    return built.select("doc_id", "payload", modality.alias("modality"))


def _block_features(content: list[int]) -> list[float]:
    """FEATURE_DIM block means of decoded content units, scaled to
    [0, 1): a deterministic content-derived featurizer (the shape a real
    model produces; the values prove decoded bytes reached it)."""
    n = len(content)
    if n == 0:
        return [0.0] * FEATURE_DIM
    block = max(1, n // FEATURE_DIM)
    feats = []
    for i in range(FEATURE_DIM):
        chunk = content[i * block : (i + 1) * block] or [0]
        feats.append((sum(chunk) / len(chunk) % 65536) / 65536.0)
    return feats


def _fallback_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature vector: first FEATURE_DIM bytes of
    the payload's sha256 digest scaled into [0, 1)."""
    digest = hashlib.sha256(payload).digest()
    return [b / 256.0 for b in digest[:FEATURE_DIM]]


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas). Per batch: run the REAL decoder (BMP/WAV parsers) and
    featurize the decoded content; payloads that are not parseable
    containers (raw bytes, truncation, unknown modality) fall back to
    deterministic digest features, flagged ``decoded=false``.
    The batch shape is the real contract: payload arrives as a bytes
    Series per Arrow batch; output is a fixed-width ``array<float>``
    column — the shape an embedding model or image featurizer produces
    at scale. Accepts either a flat ``modality`` column or the
    ``meta.modality`` struct field."""
    import pandas as pd

    out_schema = (
        "doc_id long, modality string, features array<float>, decoded boolean"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats, decoded_flags = [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                raw = bytes(payload)
                try:
                    content = decode_media(raw, modality)
                    feats.append(_block_features(content))
                    decoded_flags.append(True)
                except DECODE_FALLBACK_ERRORS:
                    # corrupt/truncated payloads must take the digest
                    # fallback, not fail the task
                    feats.append(_fallback_features(raw))
                    decoded_flags.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                    "decoded": decoded_flags,
                }
            )

    cols = ["doc_id", "payload"]
    src = mm
    if "modality" not in mm.columns:
        src = mm.withColumn("modality", F.col("meta.modality"))
    # modest fan-out: each NEW partition pays a Python worker cold-start
    # (fork + Arrow init), so matching core count on a small input spends
    # more on spawns than it wins in parallelism; 8 balances both. On a
    # warm cluster (reused workers) raise toward the core count.
    flat = fan_out(src.select(*cols, "modality"), min_parallelism=8)
    return flat.mapInPandas(batches, out_schema)


@_register("multimodal_feature_extract", None)  # Python featurizer → rows-only
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction end-to-end over REAL media containers:
    documents → BMP/WAV/RVID payloads (with_media_payload) →
    mapInPandas decode + featurize → per-item float vector + a JVM-side
    L2 norm over the result (proving the extracted vectors flow back
    into built-in higher-order fns). All three modalities report
    decoded=true (each parser ran); the digest fallback remains for
    unparseable payloads."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(with_media_payload(docs))
    norm = F.sqrt(
        F.aggregate(
            F.col("features"),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return feats.select(
        "doc_id", "modality", F.round(norm, 4).alias("feature_norm"), "decoded"
    )


# ---------------------------------------------------------------------------
# Resize / resample (the remaining op of the mandated decode /
# feature-extract / resize / frame-sample multimodal quartet)
# ---------------------------------------------------------------------------

OUT_IMG_W, OUT_IMG_H = 4, 2  # fixed thumbnail dims, the write-time contract
OUT_SAMPLES = 16  # fixed audio resample length


def resize_nearest(
    width: int, height: int, pixels: bytes, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor RGB resize: output pixel (x, y) copies source
    pixel (x*W//out_w, y*H//out_h) — integer-exact index math, so the
    result is bit-deterministic everywhere. Pure helper (no Spark), unit-
    and property-tested directly."""
    out = bytearray()
    for y in range(out_h):
        sy = y * height // out_h
        row = 3 * sy * width
        for x in range(out_w):
            sx = x * width // out_w
            i = row + 3 * sx
            out += pixels[i : i + 3]
    return bytes(out)


def resample_nearest(samples: list[int], out_n: int) -> list[int]:
    """Nearest-neighbor PCM resample to a fixed length (same integer
    index rule as resize_nearest); empty input yields silence."""
    n = len(samples)
    if n == 0:
        return [0] * out_n
    return [samples[i * n // out_n] for i in range(out_n)]


def resize_media(
    mm: DataFrame,
    out_w: int = OUT_IMG_W,
    out_h: int = OUT_IMG_H,
    out_samples: int = OUT_SAMPLES,
) -> DataFrame:
    """Arrow-batched media resize over binary payloads (mapInPandas):
    images (GIF/BMP, sniffed by magic) resize to ``out_w``x``out_h``
    nearest-neighbor; audio resamples to ``out_samples`` PCM16 points;
    video resizes EVERY frame (frame count preserved). Unparseable
    payloads pass through with ``resized=false`` and the original digest
    — the same fallback contract as extract_features.

    Output carries the resized payload's md5 plus in/out unit counts, so
    downstream can verify volume reduction without touching bytes. At
    100 TB this is the classic thumbnail/feature-prep pass: payload bytes
    stream through Python workers batch-by-batch, never shuffle, and the
    emitted rows are a fixed few dozen bytes regardless of media size."""
    import pandas as pd

    out_schema = (
        "doc_id long, modality string, in_units int, out_units int, "
        "resized_digest string, mean_unit double, "
        "unit_sum long, unit_wsum long, resized boolean"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from user_feed_cdc_spark.functions.numeric import py_round_half_up

        for pdf in it:
            rows = {k: [] for k in (
                "in_units", "out_units", "resized_digest", "mean_unit",
                "unit_sum", "unit_wsum", "resized",
            )}
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                raw = bytes(payload)
                try:
                    if modality == "image":
                        w, h, px = decode_image(raw)
                        resized = resize_nearest(w, h, px, out_w, out_h)
                        units = list(resized)
                        in_n = w * h * 3
                    elif modality == "audio":
                        _rate, samples = decode_wav(raw)
                        units = resample_nearest(samples, out_samples)
                        resized = encode_wav(units)[44:]  # data chunk only
                        in_n = len(samples)
                    elif modality == "video":
                        w, h, _fps, frames = decode_rvid(raw)
                        out_frames = [
                            resize_nearest(w, h, f, out_w, out_h)
                            for f in frames
                        ]
                        resized = b"".join(out_frames)
                        units = list(resized)
                        in_n = w * h * 3 * len(frames)
                    else:
                        raise NotImplementedError(modality)
                    rows["in_units"].append(in_n)
                    rows["out_units"].append(len(units))
                    rows["resized_digest"].append(
                        hashlib.md5(resized).hexdigest()
                    )
                    mean = sum(units) / len(units) if units else 0.0
                    rows["mean_unit"].append(py_round_half_up(mean, 4))
                    # integer checksums over the resized units: the
                    # position-weighted sum pins VALUE AND ORDER of
                    # every output unit exactly (no float, no digest),
                    # which is what lets a SQL oracle replay the whole
                    # decode→resize pass (multimodal_resize_certified)
                    rows["unit_sum"].append(sum(units))
                    rows["unit_wsum"].append(
                        sum((i + 1) * u for i, u in enumerate(units))
                    )
                    rows["resized"].append(True)
                except DECODE_FALLBACK_ERRORS:
                    rows["in_units"].append(len(raw))
                    rows["out_units"].append(len(raw))
                    rows["resized_digest"].append(
                        hashlib.md5(raw).hexdigest()
                    )
                    rows["mean_unit"].append(0.0)
                    rows["unit_sum"].append(0)
                    rows["unit_wsum"].append(0)
                    rows["resized"].append(False)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "modality": pdf["modality"], **rows}
            )

    src = mm
    if "modality" not in mm.columns:
        src = mm.withColumn("modality", F.col("meta.modality"))
    flat = fan_out(src.select("doc_id", "payload", "modality"), min_parallelism=8)
    return flat.mapInPandas(batches, out_schema)


@_register("multimodal_resize", None)  # Python resizer → rows-only
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize end-to-end over REAL media containers: documents →
    GIF/BMP/WAV/RVID payloads (with_media_payload) → mapInPandas
    nearest-neighbor resize/resample (resize_media). Every modality
    reports resized=true (each decoder + resizer ran); the in/out unit
    counts expose the data-volume reduction the pass exists for. The
    resize kernels themselves are pure helpers certified by unit +
    hypothesis tests (identity at same dims, exact pixel picks, block
    structure) — the Spark entry certifies the distributed plumbing."""
    docs = load_table(spark, sf_dir, "documents")
    return resize_media(with_media_payload(docs)).select(
        "doc_id", "modality", "in_units", "out_units", "resized_digest",
        "mean_unit", "resized",
    )


_RESIZE_CERT_ORACLE = """
    WITH m AS (
        SELECT doc_id, text, length(text) AS tl,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality
        FROM documents
        WHERE length(text) >= 1
    ),
    u AS (
        SELECT doc_id, modality,
               CASE
                 WHEN modality = 'image' AND doc_id % 6 = 0 THEN
                   list_transform(range(0, 24), j -> CAST(ascii(substr(text,
                       CAST(((16 * (j // 12) + 2 * ((j % 12) // 3)) % tl) + 1
                            AS INT), 1)) AS BIGINT))
                 WHEN modality = 'image' THEN
                   list_transform(range(0, 24), j -> CAST(ascii(substr(text,
                       CAST(((48 * (j // 12) + 6 * ((j % 12) // 3) + (j % 3))
                             % tl) + 1 AS INT), 1)) AS BIGINT))
                 WHEN modality = 'audio' THEN
                   list_transform(range(0, 16), i -> CAST((ascii(substr(text,
                       CAST(((6 * i) % tl) + 1 AS INT), 1)) - 128) * 256
                       AS BIGINT))
                 ELSE
                   list_transform(range(0, 96), j -> CAST(ascii(substr(text,
                       CAST((j % tl) + 1 AS INT), 1)) AS BIGINT))
               END AS units
        FROM m
    )
    SELECT doc_id, modality,
           96 AS in_units,
           CAST(len(units) AS INT) AS out_units,
           CAST(list_sum(units) AS BIGINT) AS unit_sum,
           CAST(list_sum(list_transform(range(1, len(units) + 1),
                                        i -> i * units[i])) AS BIGINT)
               AS unit_wsum,
           TRUE AS resized
    FROM u
"""


@_register("multimodal_resize_certified", _RESIZE_CERT_ORACLE)
def multimodal_resize_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HASH-CERTIFIED twin of multimodal_resize (r07 VERDICT item 4:
    the rows-only entry was the only window entry with no oracle at
    all). Same code path end to end — with_media_payload builds REAL
    GIF/BMP/WAV/RVID containers, resize_media decodes and
    nearest-neighbor-resizes them in an Arrow mapInPandas stage — but
    the certified columns are the integer-exact slice: in/out unit
    counts plus a plain and a position-weighted checksum over the
    resized units. Because container content derives from the doc's
    ASCII bytes (content[p] = text_byte[p mod len]) and the resize
    kernel is pure integer index math (out(y,x,c) copies
    src(x*W//outW, y*H//outH)), the DuckDB oracle replays the ENTIRE
    decode→resize pass symbolically with list_transform(range(...)) —
    so every byte the Python decoders and resizers touch is pinned by
    value AND position under the driver's hash gate, while the full
    payload/digest path stays on the rows-only twin. Fallback rows
    would surface as checksum 0 ≠ oracle (none occur: every synthetic
    container decodes). Empty docs are filtered in BOTH engines (none
    exist at any SF; the guard makes the content[p mod len] contract
    total instead of latent)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 1
    )
    return resize_media(with_media_payload(docs)).select(
        "doc_id", "modality", "in_units", "out_units",
        "unit_sum", "unit_wsum", "resized",
    )


# ---------------------------------------------------------------------------
# Perceptual-hash (dHash) image near-dup
# ---------------------------------------------------------------------------

_DHASH_COLS, _DHASH_ROWS = 9, 8  # 8x8 adjacent-column comparisons = 64 bits


def dhash64(w: int, h: int, rgb: bytes) -> int:
    """Difference hash over decoded RGB content: integer-mean grayscale,
    nearest-neighbor resample to a 9x8 grid, one bit per adjacent-column
    comparison (left > right), row-major MSB-first — 64 bits, returned
    as a SIGNED two's-complement int so it stores in a Spark LongType.
    Gradient-based, so it is invariant to uniform brightness shifts and
    (unlike content digests) stable under resizing — the property that
    makes it a near-dup key where md5 only finds byte-exact copies.
    Pure integer arithmetic end to end: no float, no platform drift."""
    # DecodeError, not bare ValueError: zero-dim or short content out of
    # a crafted-but-parseable container is still a data error and must
    # take the fallback path, not fail the stage
    if w <= 0 or h <= 0 or len(rgb) < w * h * 3:
        raise DecodeError("dhash64: malformed decoded content")
    gray = [
        (rgb[3 * i] + rgb[3 * i + 1] + rgb[3 * i + 2]) // 3
        for i in range(w * h)
    ]
    bits = 0
    for r in range(_DHASH_ROWS):
        src_r = r * h // _DHASH_ROWS
        row = [
            gray[src_r * w + (c * w // _DHASH_COLS)]
            for c in range(_DHASH_COLS)
        ]
        for c in range(_DHASH_COLS - 1):
            bits = (bits << 1) | (1 if row[c] > row[c + 1] else 0)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


_PHASH_ORACLE = """
    WITH m AS (
        SELECT doc_id, text, length(text) AS tl
        FROM documents
        WHERE doc_id % 3 = 0 AND length(text) >= 1
    ),
    g AS (
        SELECT doc_id,
               CASE WHEN doc_id % 6 = 0 THEN
                 list_transform(range(0, 32), i -> CAST(ascii(substr(text,
                     CAST((i % tl) + 1 AS INT), 1)) AS BIGINT))
               ELSE
                 list_transform(range(0, 32), i ->
                   (CAST(ascii(substr(text,
                        CAST(((3 * i) % tl) + 1 AS INT), 1)) AS BIGINT)
                    + ascii(substr(text,
                        CAST(((3 * i + 1) % tl) + 1 AS INT), 1))
                    + ascii(substr(text,
                        CAST(((3 * i + 2) % tl) + 1 AS INT), 1))) // 3)
               END AS gray
        FROM m
    ),
    b AS (
        SELECT doc_id,
               list_sum(list_transform(range(0, 32), k ->
                 CASE WHEN gray[CAST((k // 8) // 2 * 8
                                     + (k % 8) * 8 // 9 + 1 AS INT)]
                        > gray[CAST((k // 8) // 2 * 8
                                     + ((k % 8) + 1) * 8 // 9 + 1 AS INT)]
                      THEN CAST(1 AS BIGINT) << CAST(31 - k AS INT)
                      ELSE 0 END)) AS hi,
               list_sum(list_transform(range(32, 64), k ->
                 CASE WHEN gray[CAST((k // 8) // 2 * 8
                                     + (k % 8) * 8 // 9 + 1 AS INT)]
                        > gray[CAST((k // 8) // 2 * 8
                                     + ((k % 8) + 1) * 8 // 9 + 1 AS INT)]
                      THEN CAST(1 AS BIGINT) << CAST(63 - k AS INT)
                      ELSE 0 END)) AS lo
        FROM g
    ),
    h AS (
        SELECT doc_id,
               CAST((hi - CASE WHEN hi >= 2147483648
                          THEN 4294967296 ELSE 0 END)
                    * 4294967296 + lo AS BIGINT) AS phash
        FROM b
    )
    SELECT doc_id, phash, TRUE AS decoded,
           CAST(COUNT(*) OVER (PARTITION BY phash) AS BIGINT) AS group_size,
           CAST(MIN(doc_id) OVER (PARTITION BY phash) AS BIGINT)
               AS exemplar_id,
           doc_id <> MIN(doc_id) OVER (PARTITION BY phash) AS is_dup
    FROM h
"""


@_register("multimodal_phash_dedup", _PHASH_ORACLE)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup via PERCEPTUAL hash: decode each image payload
    (GIF/BMP, dispatched on magic bytes), compute the 64-bit dHash, and
    group images sharing a hash — re-encoded, brightness-shifted, or
    resized copies collide where md5 (byte-exact: multimodal_binary_
    stats / dedup_exact_docs) cannot. The is_dup rule is the dedup-
    family convention: every group keeps its min-doc_id exemplar.

    The decode+hash is the justified Arrow-batched Python stage (the
    same mapInPandas tier as the certified featurizer, same fallback
    contract: undecodable payloads emit a NULL hash and never join the
    grouping); everything after is JVM-side — an 8-byte key groupBy,
    exactly the exact-dedup shuffle shape. At 100 TB payload bytes
    stream through Python workers once and never shuffle; production
    hardening is banding the 64 bits like SimHash for hamming-distance
    (not just equal-hash) candidates.

    HASH-CERTIFIED since r09 (was the registry's last rows-only/
    no-oracle entry — r08 VERDICT item 2): the DuckDB oracle replays
    the ENTIRE decode→dHash pass symbolically via the byte-derivation
    trick multimodal_resize_certified proved out. Container content
    derives from the doc's ASCII bytes (content[p] = text_byte[p mod
    len]); GIF decode expands the 256-gray palette to tripled-gray RGB
    so gray[i] = content[i], BMP decode is the identity so gray[i] =
    mean of content[3i..3i+2]; the 9x8 dHash grid is pure integer index
    math ((c*8)//9 column taps, r//2 row taps), so the oracle rebuilds
    all 64 comparison bits with list_transform(range(...)) and packs
    them into the same signed two's-complement BIGINT as two 32-bit
    halves — every byte the Python decoders and the dhash64 kernel
    touch is pinned by value AND position under the hash gate. A
    decode fallback (NULL phash) would hash-mismatch the oracle's
    decoded=TRUE row — loud by design; none occur on the synthetic
    corpus, and the dhash64 kernel keeps its own unit tests (identity,
    brightness invariance, gradient sensitivity). Empty docs filtered
    in BOTH engines (none exist; makes the mod-len contract total)."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 0)  # the image rows of the media corpus
        & (F.length("text") >= 1)
    )
    mm = with_media_payload(docs).select("doc_id", "payload")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            hashes, flags = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                try:
                    w, h, px = decode_image(raw)
                    hashes.append(dhash64(w, h, px))
                    flags.append(True)
                except DECODE_FALLBACK_ERRORS:
                    hashes.append(None)
                    flags.append(False)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "phash": pd.array(hashes, dtype="Int64"), "decoded": flags}
            )

    hashed = fan_out(mm, min_parallelism=8).mapInPandas(
        batches, "doc_id long, phash long, decoded boolean"
    )
    # ONE phash-partitioned window pass computes group size and exemplar
    # — no self-join, so the Python decode stage executes exactly once
    # (undecoded rows share the NULL-phash partition, but their stats
    # are gated to 0/NULL by the decoded flag: a non-null phash implies
    # decoded, so within a real group count(*) == decoded count).
    w = W.partitionBy("phash")
    exemplar = F.when(F.col("decoded"), F.min("doc_id").over(w))
    return hashed.select(
        "doc_id",
        "phash",
        "decoded",
        F.when(F.col("decoded"), F.count(F.lit(1)).over(w))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("group_size"),
        exemplar.alias("exemplar_id"),
        (F.col("decoded") & (F.col("doc_id") != exemplar)).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# Real-container video: RIFF/AVI frame walk + sampled-frame stats
# ---------------------------------------------------------------------------

_AVI_SAMPLE_STRIDE = 2  # sample every 2nd frame (frames 0 and 2 of 4)


def with_avi_payload(docs: DataFrame) -> DataFrame:
    """Video documents → rows whose ``payload`` is a REAL RIFF/AVI
    container (uncompressed 24bpp DIB '00db' frames): the doc's bytes
    split into VID_W×VID_H RGB frames, same content derivation as
    with_media_payload's RVID arm, but wrapped in the standard format
    an ffmpeg `-c:v rawvideo` export produces. Arrow-batched
    mapInPandas — container assembly is what an ingestion job does
    once, at write time."""
    import pandas as pd

    content_len = IMG_W * IMG_H * 3
    fb = VID_W * VID_H * 3

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")
                content = (raw * (content_len // max(len(raw), 1) + 1))[
                    :content_len
                ]
                frames = [
                    bytes(content[i : i + fb])
                    for i in range(0, content_len, fb)
                ]
                payloads.append(encode_avi(VID_W, VID_H, frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )


_VIDEO_AVI_ORACLE = """
    WITH m AS (
        SELECT doc_id, text, length(text) AS tl
        FROM documents
        WHERE doc_id % 3 = 2 AND length(text) >= 1
    ),
    u AS (
        SELECT doc_id,
               list_transform(range(0, 48), g ->
                 CAST(ascii(substr(text,
                     CAST(((48 * (g // 24) + g % 24) % tl) + 1 AS INT),
                     1)) AS BIGINT)) AS su,
               list_transform(range(0, 8), i ->
                 (CAST(ascii(substr(text,
                      CAST(((3 * i) % tl) + 1 AS INT), 1)) AS BIGINT)
                  + ascii(substr(text,
                      CAST(((3 * i + 1) % tl) + 1 AS INT), 1))
                  + ascii(substr(text,
                      CAST(((3 * i + 2) % tl) + 1 AS INT), 1))) // 3)
                 AS gray
        FROM m
    ),
    b AS (
        SELECT doc_id, su,
               list_sum(list_transform(range(0, 32), k ->
                 CASE WHEN gray[CAST((k // 8) // 4 * 4
                                     + (k % 8) * 4 // 9 + 1 AS INT)]
                        > gray[CAST((k // 8) // 4 * 4
                                     + ((k % 8) + 1) * 4 // 9 + 1 AS INT)]
                      THEN CAST(1 AS BIGINT) << CAST(31 - k AS INT)
                      ELSE 0 END)) AS hi,
               list_sum(list_transform(range(32, 64), k ->
                 CASE WHEN gray[CAST((k // 8) // 4 * 4
                                     + (k % 8) * 4 // 9 + 1 AS INT)]
                        > gray[CAST((k // 8) // 4 * 4
                                     + ((k % 8) + 1) * 4 // 9 + 1 AS INT)]
                      THEN CAST(1 AS BIGINT) << CAST(63 - k AS INT)
                      ELSE 0 END)) AS lo
        FROM u
    )
    SELECT doc_id,
           CAST(4 AS BIGINT) AS width, CAST(2 AS BIGINT) AS height,
           CAST(12 AS BIGINT) AS fps, CAST(4 AS BIGINT) AS n_frames,
           CAST(2 AS BIGINT) AS n_sampled,
           CAST(list_sum(su) AS BIGINT) AS sampled_sum,
           CAST(list_sum(list_transform(range(1, 49), i -> i * su[i]))
                AS BIGINT) AS sampled_wsum,
           CAST((hi - CASE WHEN hi >= 2147483648
                      THEN 4294967296 ELSE 0 END)
                * 4294967296 + lo AS BIGINT) AS phash_first,
           TRUE AS decoded
    FROM b
"""


@_register("multimodal_video_avi_stats", _VIDEO_AVI_ORACLE)
def multimodal_video_avi_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video-modality completion (r08 VERDICT item 4): a REAL
    RIFF/AVI container walk — with_avi_payload wraps each video doc's
    frames in a standard uncompressed-DIB AVI, decode_avi demuxes it
    chunk-by-chunk (avih dims, strh fps, strf pixel format, movi
    frames, DIB row-padding/orientation handling), then the existing
    kernels run over the decoded frames: stride-{_AVI_SAMPLE_STRIDE}
    frame sampling with exact integer checksums (plain + position-
    weighted over the concatenated sampled bytes) and the dhash64
    perceptual hash of the first frame — proving decoded frame bytes,
    not payload bytes, reached the feature kernels. Compressed video
    (H.264-class) remains the documented ffmpeg-class plug point with
    the digest fallback; a fallback row here (decoded=false, zeroed
    stats) would hash-mismatch the oracle loudly — none occur.

    HASH-CERTIFIED via the symbolic byte-derivation oracle: frame
    content derives from the doc's ASCII bytes (frame s, byte j ←
    text[(24s + j) mod len]), the stride picks frames 0 and 2, and the
    4x2 dHash taps are pure integer index math — so DuckDB replays the
    entire build→demux→sample→hash pass with list_transform(range())
    and every byte the walker emits is pinned by value AND position.
    Scale: payload bytes stream through the two Arrow stages once and
    never shuffle; the output is 10 scalar columns per video — the
    same narrow-over-scan shape as the certified featurizer. At 100 TB
    the build stage disappears (containers already exist) and the walk
    parallelizes per-file with no skew (frame count bounds the row's
    work)."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 2) & (F.length("text") >= 1)
    )
    mm = with_avi_payload(docs)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "width": [], "height": [],
                "fps": [], "n_frames": [], "n_sampled": [],
                "sampled_sum": [], "sampled_wsum": [], "phash_first": [],
                "decoded": [],
            }
            for payload in pdf["payload"]:
                try:
                    w, h, fps, frames = decode_avi(bytes(payload))
                    sampled = frames[::_AVI_SAMPLE_STRIDE]
                    cat = b"".join(sampled)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["fps"].append(fps)
                    out["n_frames"].append(len(frames))
                    out["n_sampled"].append(len(sampled))
                    out["sampled_sum"].append(sum(cat))
                    out["sampled_wsum"].append(
                        sum((i + 1) * v for i, v in enumerate(cat))
                    )
                    out["phash_first"].append(dhash64(w, h, frames[0]))
                    out["decoded"].append(True)
                except DECODE_FALLBACK_ERRORS:
                    for k in (
                        "width", "height", "fps", "n_frames", "n_sampled",
                        "sampled_sum", "sampled_wsum", "phash_first",
                    ):
                        out[k].append(0)
                    out["decoded"].append(False)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, width long, height long, fps long, n_frames long, "
        "n_sampled long, sampled_sum long, sampled_wsum long, "
        "phash_first long, decoded boolean",
    )


_VIDEO_MJPEG_ORACLE = """
    WITH m AS (
        SELECT doc_id, text, length(text) AS tl
        FROM documents
        WHERE doc_id % 3 = 2 AND length(text) >= 1
    )
    SELECT doc_id,
           CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
           CAST(12 AS BIGINT) AS fps, CAST(2 AS BIGINT) AS n_frames,
           CAST(192 * (ascii(substr(text, 1, 1))
                       + ascii(substr(text, CAST((1 % tl) + 1 AS INT), 1)))
                AS BIGINT) AS frame_sum,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS v_first,
           CAST(ascii(substr(text, CAST((1 % tl) + 1 AS INT), 1)) AS BIGINT)
               AS v_last,
           TRUE AS decoded
    FROM m
"""


@_register("multimodal_video_mjpeg_stats", _VIDEO_MJPEG_ORACLE)
def multimodal_video_mjpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOTION-JPEG decode, end to end and HASH-CERTIFIED — the r09
    'one genuinely heavy missing codec' closed: each video doc's
    payload is a real MJPG AVI whose two frames are baseline JPEGs
    (pure-stdlib encoder, operators/jpeg.py), and the read path runs
    the full production stack — RIFF walk (shared _walk_avi), strf
    fourcc dispatch, per-frame baseline JPEG decode (marker parse,
    DHT canonical Huffman rebuild, FF00 unstuffing, DC prediction,
    dequant + dezigzag + float IDCT), gray→RGB expansion — before
    the stats kernels see a byte.

    The symbolic oracle works because a FLAT 8x8 block survives
    encode→decode BIT-EXACTLY at quant=1 (its DCT is DC-only with
    DC = 8·(v−128) stored exactly; the IDCT of a DC-only block is
    v−128 in every cell with zero float rounding — pinned by
    tests/test_jpeg.py): frame s is a solid JPEG of value
    text[s mod len], so DuckDB predicts every decoded byte — the
    checksum (192·(v0+v1)), the first byte of frame 0, and the last
    byte of frame 1 — without modeling the codec. Non-flat content is
    covered by hypothesis round-trip tolerance tests (±1 gray, ±3
    color through the YCbCr double-rounding), the honest contract of
    a lossy codec. Scale: identical narrow-over-scan shape as the
    raw-AVI entry — payloads stream through Arrow once, bounded
    per-row decode work, 9 scalar columns out, no shuffle; H.264
    inter-frame codecs remain the external plug point, certified by
    multimodal_codec_fallback."""
    import pandas as pd

    from user_feed_cdc_spark.operators.jpeg import encode_jpeg

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 2) & (F.length("text") >= 1)
    )

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        flat: dict[int, bytes] = {}  # 256 possible solid frames, built
        # on demand per executor — the fixture encode is not the code
        # under test, the decode is

        def jpeg_of(v: int) -> bytes:
            if v not in flat:
                flat[v] = encode_jpeg(8, 8, bytes([v]) * 64)
            return flat[v]

        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                raw = ascii_seed(text)
                frames = [jpeg_of(raw[s % len(raw)]) for s in range(2)]
                payloads.append(
                    encode_avi(8, 8, frames, compression=b"MJPG")
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    mm = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "width": [], "height": [],
                "fps": [], "n_frames": [], "frame_sum": [], "v_first": [],
                "v_last": [], "decoded": [],
            }
            for payload in pdf["payload"]:
                try:
                    w, h, fps, frames = decode_avi_mjpeg(bytes(payload))
                    cat = b"".join(frames)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["fps"].append(fps)
                    out["n_frames"].append(len(frames))
                    out["frame_sum"].append(sum(cat))
                    out["v_first"].append(frames[0][0])
                    out["v_last"].append(frames[-1][-1])
                    out["decoded"].append(True)
                except DECODE_FALLBACK_ERRORS:
                    for k in (
                        "width", "height", "fps", "n_frames", "frame_sum",
                        "v_first", "v_last",
                    ):
                        out[k].append(0)
                    out["decoded"].append(False)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, width long, height long, fps long, n_frames long, "
        "frame_sum long, v_first long, v_last long, decoded boolean",
    )


_VIDEO_MJPEG_420_ORACLE = """
    WITH m AS (
        SELECT doc_id, text, length(text) AS tl
        FROM documents
        WHERE doc_id % 3 = 2 AND length(text) >= 1
    )
    SELECT doc_id,
           CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
           CAST(12 AS BIGINT) AS fps, CAST(2 AS BIGINT) AS n_frames,
           CAST(768 * (ascii(substr(text, 1, 1))
                       + ascii(substr(text, CAST((1 % tl) + 1 AS INT), 1)))
                AS BIGINT) AS frame_sum,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS v_first,
           CAST(ascii(substr(text, CAST((1 % tl) + 1 AS INT), 1)) AS BIGINT)
               AS v_last,
           TRUE AS decoded
    FROM m
"""


@_register("multimodal_video_mjpeg_420_stats", _VIDEO_MJPEG_420_ORACLE)
def multimodal_video_mjpeg_420_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """4:2:0 CHROMA-SUBSAMPLED Motion-JPEG decode under the hash gate —
    the r10 VERDICT gap ("the dominant real-world baseline JPEG form,
    currently a loud refusal") closed: each video doc's payload is an
    MJPG AVI whose two 16x16 COLOR frames are baseline JPEGs with luma
    2x2 / chroma 1x1 sampling, so the decoder must run the full
    interleaved-MCU machinery the 4:4:4 entry never touches — four
    luma data units + Cb + Cr per MCU, per-component sampling planes,
    nearest-neighbor chroma upsampling — before the stats kernels see
    a byte (operators/jpeg.py; MCU order per T.81 A.2.3).

    The symbolic oracle extends the flat-block exactness contract to
    4:2:0: a solid gray-RGB frame of value v maps to YCbCr (v,128,128)
    exactly, the 2x2 chroma MEAN of equal values is exact, every data
    unit is DC-only at quant=1, and upsampling a constant is the
    constant — so frame s of doc text decodes bit-exactly to
    (v_s, v_s, v_s) * 256 with v_s = text[s mod len], and DuckDB
    predicts the 768·(v0+v1) checksum plus first/last bytes without
    modeling the codec (tests/test_jpeg.py pins the contract for every
    value and the smooth-gradient tolerance for non-flat content).
    Scale: identical narrow-over-scan shape as the 4:4:4 entry —
    payloads stream through Arrow once, bounded per-row decode work,
    no shuffle."""
    import pandas as pd

    from user_feed_cdc_spark.operators.jpeg import encode_jpeg

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 2) & (F.length("text") >= 1)
    )

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        flat: dict[int, bytes] = {}

        def jpeg_of(v: int) -> bytes:
            if v not in flat:
                flat[v] = encode_jpeg(
                    16, 16, bytes([v, v, v]) * 256, gray=False,
                    subsampling="420",
                )
            return flat[v]

        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                raw = ascii_seed(text)
                frames = [jpeg_of(raw[s % len(raw)]) for s in range(2)]
                payloads.append(
                    encode_avi(16, 16, frames, compression=b"MJPG")
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    mm = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "width": [], "height": [],
                "fps": [], "n_frames": [], "frame_sum": [], "v_first": [],
                "v_last": [], "decoded": [],
            }
            for payload in pdf["payload"]:
                try:
                    w, h, fps, frames = decode_avi_mjpeg(bytes(payload))
                    cat = b"".join(frames)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["fps"].append(fps)
                    out["n_frames"].append(len(frames))
                    out["frame_sum"].append(sum(cat))
                    out["v_first"].append(frames[0][0])
                    out["v_last"].append(frames[-1][-1])
                    out["decoded"].append(True)
                except DECODE_FALLBACK_ERRORS:
                    for k in (
                        "width", "height", "fps", "n_frames", "frame_sum",
                        "v_first", "v_last",
                    ):
                        out[k].append(0)
                    out["decoded"].append(False)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, width long, height long, fps long, n_frames long, "
        "frame_sum long, v_first long, v_last long, decoded boolean",
    )


_IMAGE_PROGRESSIVE_ORACLE = """
    WITH m AS (
        SELECT doc_id, ascii(substr(text, 1, 1)) AS v
        FROM documents
        WHERE doc_id % 3 = 2 AND length(text) >= 1
    )
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END AS BIGINT)
               AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END AS BIGINT)
               AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS BIGINT)
               AS ncomp,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 64 * v ELSE 768 * v END
                AS BIGINT) AS pixel_sum,
           CAST(v AS BIGINT) AS v_first,
           TRUE AS decoded
    FROM m
"""


@_register("multimodal_image_progressive_stats", _IMAGE_PROGRESSIVE_ORACLE)
def multimodal_image_progressive_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROGRESSIVE JPEG (SOF2) decode under the hash gate — the last
    implementable r11 VERDICT refusal ("progressive JPEG remains a
    loud, certified refusal path") closed: each image doc's payload is
    a six-scan progressive JPEG (operators/jpeg.py
    encode_jpeg_progressive — DC successive approximation at Al=1 with
    an interleaved refinement scan, per-component spectral-selection AC
    bands, AC refinement scans, EOBn runs), and the read path runs the
    full T.81 Annex G machinery: per-scan coefficient accumulation,
    the AC-refinement correction-bit state machine, and a single
    dequant+IDCT render at EOI. Even doc_ids carry 8x8 grayscale,
    odd doc_ids 16x16 4:2:0 color — so both the interleaved-MCU DC
    path and the non-interleaved per-component AC geometry (ceil-grid
    vs MCU-pad) are exercised under ONE oracle.

    The symbolic oracle leans on two pinned contracts: the flat-block
    exactness of the baseline codec (DC-only blocks render bit-exactly
    at quant=1), and progressive entropy coding being LOSSLESS on
    quantized coefficients — decode(progressive) == decode(baseline)
    for every image, certified by hypothesis in tests/test_jpeg.py —
    so DuckDB predicts every decoded byte of a solid frame without
    modeling the codec. Scale: narrow-over-scan, payloads stream
    through Arrow once, bounded per-row decode, no shuffle; reference
    treats media as opaque bytes (user_feed_cdc/README.md), this tier
    decodes the web's second-dominant JPEG form for real."""
    import pandas as pd

    from user_feed_cdc_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_progressive,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 2) & (F.length("text") >= 1)
    )

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        gray_cache: dict[int, bytes] = {}
        color_cache: dict[int, bytes] = {}

        def prog_of(v: int, gray: bool) -> bytes:
            cache = gray_cache if gray else color_cache
            if v not in cache:
                cache[v] = (
                    encode_jpeg_progressive(8, 8, bytes([v]) * 64)
                    if gray
                    else encode_jpeg_progressive(
                        16, 16, bytes([v, v, v]) * 256, gray=False,
                        subsampling="420",
                    )
                )
            return cache[v]

        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                v = ascii_seed(text)[0]
                payloads.append(prog_of(v, int(doc_id) % 2 == 0))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    mm = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "width": [], "height": [],
                "ncomp": [], "pixel_sum": [], "v_first": [], "decoded": [],
            }
            for payload in pdf["payload"]:
                try:
                    w, h, nc, px = decode_jpeg(bytes(payload))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["ncomp"].append(nc)
                    out["pixel_sum"].append(sum(px))
                    out["v_first"].append(px[0])
                    out["decoded"].append(True)
                except (ValueError,):
                    for k in (
                        "width", "height", "ncomp", "pixel_sum", "v_first",
                    ):
                        out[k].append(0)
                    out["decoded"].append(False)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, width long, height long, ncomp long, "
        "pixel_sum long, v_first long, decoded boolean",
    )


_VIDEO_RLE8_ORACLE = """
    WITH m AS (
        SELECT doc_id,
               ascii(substr(text, 1, 1)) AS v0,
               ascii(substr(text,
                     CAST((1 % length(text)) + 1 AS INT), 1)) AS v1
        FROM documents
        WHERE doc_id % 3 = 2 AND length(text) >= 1
    )
    SELECT doc_id,
           CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
           CAST(12 AS BIGINT) AS fps, CAST(2 AS BIGINT) AS n_frames,
           CAST(1515 * v0 + 21 * v1 AS BIGINT) AS frame_sum,
           CAST(CASE WHEN v0 = v1 THEN 0 ELSE 7 END AS BIGINT)
               AS delta_pixels,
           CAST(v1 AS BIGINT) AS v_changed,
           CAST(v0 AS BIGINT) AS v_inherited,
           TRUE AS decoded
    FROM m
"""


@_register("multimodal_video_rle8_delta_stats", _VIDEO_RLE8_ORACLE)
def multimodal_video_rle8_delta_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INTER-FRAME video decode under the hash gate — the r11 VERDICT
    'inter-frame video remains a refusal path' closed for a real
    public codec: each video doc's payload is a Microsoft-RLE8 AVI
    (biCompression=BI_RLE8) whose second frame is a genuine P-FRAME —
    a delta-escape opcode stream that skips up 3 rows and right 4
    columns, rewrites 7 pixels (an encoded run + a word-padded
    absolute run), and ends the bitmap early, so every other pixel is
    INHERITED from the reconstructed previous frame. The decoder
    (decode_avi_rle8) applies each opcode stream on top of frame k-1's
    index buffer, bottom-up per the DIB spec, then expands through the
    strf's 256-entry RGBQUAD palette.

    RLE8 is lossless, so the symbolic oracle predicts every decoded
    byte in closed form: frame 0 is solid v0 (768*v0), frame 1 keeps
    249 pixels of v0 and holds 7 of v1 (747*v0 + 21*v1). The
    delta_pixels column is computed by COMPARING the two decoded
    frames pixel-by-pixel — if inheritance leaked zeros (fresh buffer
    instead of the previous frame) or the delta landed on the wrong
    row under the bottom-up flip, the count and frame_sum both hash-
    diverge. v_changed reads inside the rewritten span (top-down row
    12), v_inherited reads a skipped pixel. Scale: same
    narrow-over-scan shape as the other video entries — Arrow batches,
    bounded per-row decode, no shuffle; sequential frame dependence is
    WITHIN a row's payload (the parallel unit is the document),
    exactly how a real corpus shards video. Motion-compensated
    H.264-class codecs remain the certified external plug point."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 2) & (F.length("text") >= 1)
    )

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict[tuple[int, int], bytes] = {}

        def avi_of(v0: int, v1: int) -> bytes:
            if (v0, v1) not in cache:
                cache[(v0, v1)] = rle8_demo_avi(v0, v1)
            return cache[(v0, v1)]

        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                raw = ascii_seed(text)
                payloads.append(avi_of(raw[0], raw[1 % len(raw)]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    mm = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "width": [], "height": [],
                "fps": [], "n_frames": [], "frame_sum": [],
                "delta_pixels": [], "v_changed": [], "v_inherited": [],
                "decoded": [],
            }
            for payload in pdf["payload"]:
                try:
                    w, h, fps, frames = decode_avi_rle8(bytes(payload))
                    f0, f1 = frames[0], frames[1]
                    diff = sum(
                        1
                        for i in range(0, len(f0), 3)
                        if f0[i : i + 3] != f1[i : i + 3]
                    )
                    out["width"].append(w)
                    out["height"].append(h)
                    out["fps"].append(fps)
                    out["n_frames"].append(len(frames))
                    out["frame_sum"].append(sum(f0) + sum(f1))
                    out["delta_pixels"].append(diff)
                    out["v_changed"].append(f1[RLE8_DEMO_PROBE])
                    out["v_inherited"].append(f1[0])
                    out["decoded"].append(True)
                except DECODE_FALLBACK_ERRORS:
                    for k in (
                        "width", "height", "fps", "n_frames", "frame_sum",
                        "delta_pixels", "v_changed", "v_inherited",
                    ):
                        out[k].append(0)
                    out["decoded"].append(False)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, width long, height long, fps long, n_frames long, "
        "frame_sum long, delta_pixels long, v_changed long, "
        "v_inherited long, decoded boolean",
    )


_CODEC_FALLBACK_ORACLE = """
    WITH m AS (
        SELECT doc_id, text, length(text) AS tl
        FROM documents
        WHERE doc_id % 3 = 2 AND length(text) >= 1
    )
    SELECT doc_id,
           (doc_id % 2 = 0) AS decoded,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 0 END AS BIGINT)
               AS n_frames,
           CAST(CASE WHEN doc_id % 2 = 0 THEN
                 list_sum(list_transform(range(0, 96), i ->
                   CAST(ascii(substr(text, CAST((i % tl) + 1 AS INT), 1))
                        AS BIGINT)))
                 ELSE 0 END AS BIGINT) AS frame_sum,
           CAST(CASE WHEN doc_id % 2 = 0 THEN
                 list_sum(list_transform(range(72, 96), i ->
                   CAST(ascii(substr(text, CAST((i % tl) + 1 AS INT), 1))
                        AS BIGINT)))
                 ELSE
                 list_sum(list_transform(range(40, 64), i ->
                   CAST(ascii(substr(text, CAST((i % tl) + 1 AS INT), 1))
                        AS BIGINT)))
                 END AS BIGINT) AS tail_sum
    FROM m
"""


@_register("multimodal_codec_fallback", _CODEC_FALLBACK_ORACLE)
def multimodal_codec_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CERTIFIED FALLBACK for compressed video codecs the engine
    lacks (r09 verdict item 6): a mixed population — even doc_ids get
    the standard uncompressed-DIB AVI, odd doc_ids get the SAME
    container with strf biCompression='H264' and opaque '00dc'
    bitstream chunks (two 32-byte chunks derived from the doc's
    bytes; H264 because MJPG now genuinely decodes via
    decode_avi_mjpeg + operators/jpeg.py, so the fallback fixture
    uses the codec class that remains external) — runs through the
    one raw-decode path. decode_avi demuxes the uncompressed rows
    (n_frames=4 + exact frame-byte checksum) and REFUSES the
    compressed rows at the strf check; the DECODE_FALLBACK_ERRORS
    handler then records decoded=false with byte accounting taken
    from the RAW payload (the sum of its last 24 bytes — which the
    container layout puts inside the final compressed chunk).

    The oracle replays both arms symbolically: the tail of an
    uncompressed container is frame 3 (content bytes 72..95) and the
    tail of the compressed one is bitstream bytes 40..63, so the hash
    gate certifies three things at once — the dispatch (which rows
    decoded), the decoded bytes, and that the fallback accounted the
    true payload bytes rather than zeroing out. This pins the exact
    contract the MJPEG/H.264 plug point documents: compressed
    payloads pass through with faithful byte accounting, never
    silently mis-decode, never fail the stage. Scale: same
    narrow-over-scan shape as the AVI stats entry — payloads stream
    through Arrow once, 5 scalar columns out, no shuffle."""
    import pandas as pd

    content_len = IMG_W * IMG_H * 3  # 96: 4 uncompressed frames of 24
    fb = VID_W * VID_H * 3
    comp_len = 64  # 2 opaque 'H264' chunks of 32

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 2) & (F.length("text") >= 1)
    )

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                if doc_id % 2 == 0:
                    content = (raw * (content_len // max(len(raw), 1) + 1))[
                        :content_len
                    ]
                    frames = [
                        bytes(content[i : i + fb])
                        for i in range(0, content_len, fb)
                    ]
                    payloads.append(encode_avi(VID_W, VID_H, frames))
                else:
                    stream = (raw * (comp_len // max(len(raw), 1) + 1))[
                        :comp_len
                    ]
                    chunks = [bytes(stream[:32]), bytes(stream[32:])]
                    payloads.append(
                        encode_avi(
                            VID_W, VID_H, chunks, compression=b"H264"
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    mm = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "decoded": [], "n_frames": [],
                "frame_sum": [], "tail_sum": [],
            }
            for payload in pdf["payload"]:
                pb = bytes(payload)
                try:
                    _w, _h, _fps, frames = decode_avi(pb)
                    cat = b"".join(frames)
                    out["decoded"].append(True)
                    out["n_frames"].append(len(frames))
                    out["frame_sum"].append(sum(cat))
                except DECODE_FALLBACK_ERRORS:
                    out["decoded"].append(False)
                    out["n_frames"].append(0)
                    out["frame_sum"].append(0)
                out["tail_sum"].append(sum(pb[-24:]))
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, decoded boolean, n_frames long, frame_sum long, "
        "tail_sum long",
    )


_GIF_ANIMATION_ORACLE = """
    WITH m AS (
        SELECT doc_id,
               ascii(substr(text, 1, 1)) AS v0,
               ascii(substr(text,
                     CAST((1 % length(text)) + 1 AS INT), 1)) AS v1,
               ascii(substr(text,
                     CAST((2 % length(text)) + 1 AS INT), 1)) AS v2
        FROM documents
        WHERE doc_id % 3 = 2 AND length(text) >= 1
    )
    SELECT doc_id,
           CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
           CAST(3 AS BIGINT) AS n_frames,
           CAST(2247 * v0 + 45 * v1 + 12 * v2 AS BIGINT) AS total_sum,
           CAST(CASE WHEN v0 = v1 THEN 0 ELSE 15 END AS BIGINT)
               AS f2_changed,
           CAST(v0 AS BIGINT) AS f2_inherited,
           CAST(v2 AS BIGINT) AS v_last,
           TRUE AS decoded
    FROM m
"""


@_register("multimodal_gif_animation_stats", _GIF_ANIMATION_ORACLE)
def multimodal_gif_animation_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GIF89a ANIMATION decode under the hash gate — the web's other
    ubiquitous inter-frame form beside Microsoft-RLE8: each video
    doc's payload is a three-frame animation exercising the FULL
    composition model — a full-canvas base frame, a SUB-RECTANGLE
    frame whose transparent-index pixel INHERITS the canvas
    (inter-frame), a restore-to-previous disposal that UNDOES that
    frame before the third draws, plus a Netscape loop extension the
    walker must skip and real LZW data throughout
    (decode_gif_animation). GIF is lossless, so the symbolic oracle
    predicts every composed byte: total_sum spans all three canvases
    (2247·v0 + 45·v1 + 12·v2), f2_changed counts pixels differing
    between canvases 1 and 2 by COMPARING the decoded frames (a
    transparency leak or rect misplacement moves it), f2_inherited
    reads the transparent pixel, v_last proves the disposal-3 undo
    (any residue of frame 2 would leave v1 where v0 belongs and shift
    total_sum). Scale: same narrow Arrow shape as every media entry —
    bounded per-row decode, no shuffle."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 2) & (F.length("text") >= 1)
    )

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict[tuple[int, int, int], bytes] = {}

        def gif_of(v0: int, v1: int, v2: int) -> bytes:
            key = (v0, v1, v2)
            if key not in cache:
                trans = (v1 + 1) % 256  # any index the rect never draws
                idx2 = bytearray([v1]) * 16
                idx2[0] = trans
                cache[key] = encode_gif_animation(
                    16,
                    16,
                    [
                        {
                            "left": 0, "top": 0, "w": 16, "h": 16,
                            "indices": bytes([v0]) * 256,
                            "disposal": 1, "transparent": None,
                        },
                        {
                            "left": 4, "top": 3, "w": 8, "h": 2,
                            "indices": bytes(idx2),
                            "disposal": 3, "transparent": trans,
                        },
                        {
                            "left": 0, "top": 0, "w": 2, "h": 2,
                            "indices": bytes([v2]) * 4,
                            "disposal": 0, "transparent": None,
                        },
                    ],
                )
            return cache[key]

        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                raw = ascii_seed(text)
                payloads.append(
                    gif_of(raw[0], raw[1 % len(raw)], raw[2 % len(raw)])
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    mm = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "width": [], "height": [],
                "n_frames": [], "total_sum": [], "f2_changed": [],
                "f2_inherited": [], "v_last": [], "decoded": [],
            }
            for payload in pdf["payload"]:
                try:
                    w, h, frames = decode_gif_animation(bytes(payload))
                    c1, c2, c3 = frames
                    diff = sum(
                        1
                        for i in range(0, len(c1), 3)
                        if c1[i : i + 3] != c2[i : i + 3]
                    )
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(len(frames))
                    out["total_sum"].append(sum(c1) + sum(c2) + sum(c3))
                    out["f2_changed"].append(diff)
                    out["f2_inherited"].append(c2[(3 * 16 + 4) * 3])
                    out["v_last"].append(c3[0])
                    out["decoded"].append(True)
                except DECODE_FALLBACK_ERRORS:
                    for k in (
                        "width", "height", "n_frames", "total_sum",
                        "f2_changed", "f2_inherited", "v_last",
                    ):
                        out[k].append(0)
                    out["decoded"].append(False)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, width long, height long, n_frames long, "
        "total_sum long, f2_changed long, f2_inherited long, "
        "v_last long, decoded boolean",
    )


_IMAGE_PNG_ORACLE = """
    WITH m AS (
        SELECT doc_id, doc_id % 4 AS cls,
               CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS v0,
               CAST(ascii(substr(text,
                    CAST((1 % length(text)) + 1 AS INT), 1)) AS BIGINT)
                   AS v1
        FROM documents
        WHERE doc_id % 3 = 0 AND length(text) >= 1
    )
    SELECT doc_id,
           CASE cls WHEN 0 THEN 'rgb' WHEN 1 THEN 'gray'
                    WHEN 2 THEN 'rgba' ELSE 'rgb' END AS fmt,
           CAST(CASE cls WHEN 0 THEN 4 WHEN 1 THEN 5
                         WHEN 2 THEN 3 ELSE 4 END AS BIGINT) AS width,
           CAST(CASE cls WHEN 0 THEN 3 WHEN 1 THEN 4
                         WHEN 2 THEN 2 ELSE 2 END AS BIGINT) AS height,
           CAST(CASE cls WHEN 0 THEN 3 WHEN 1 THEN 1
                         WHEN 2 THEN 4 ELSE 3 END AS BIGINT) AS channels,
           CAST(CASE cls WHEN 0 THEN 12 * v0 + 24 * v1 + 66
                         WHEN 1 THEN 10 * v0 + 10 * v1 + 25
                         WHEN 2 THEN 12 * v0 + 12 * v1 + 66
                         ELSE 9 * v0 + 15 * v1 + 6 END AS BIGINT)
               AS pixel_sum,
           v0 AS probe_first,
           CAST(CASE cls WHEN 1 THEN v1 + 1 ELSE v1 END AS BIGINT)
               AS probe_last,
           TRUE AS decoded
    FROM m
"""


@_register("multimodal_image_png_stats", _IMAGE_PNG_ORACLE)
def multimodal_image_png_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PNG decode under the hash gate — the web's most common image
    format joins the codec matrix (r12 VERDICT gap 1). Each image
    doc's payload is a REAL PNG (operators/png.py: zlib-deflated
    IDAT, CRC-checked chunks) rotating through the FULL 8-bit
    colour-type matrix by doc_id%4: truecolour RGB (sequential,
    filters None/Sub/Up), greyscale laid out ADAM7-INTERLACED (six
    non-empty passes, 8 scanlines cycling every filter type), RGBA
    (alpha bytes riding the same filters at bpp 4), and a PALETTE
    image (Adam7, index bytes filtered at bpp 1, expanded through
    the PLTE at decode) — so the five-filter reconstruction, the
    interlace pass/scatter, the alpha-channel stride, and the PLTE
    expansion ALL run in the certified plan. PNG is lossless, so the
    symbolic oracle predicts every decoded byte from the doc's text
    head: RGB = v0-ramp row + two constant-v1 rows (12·v0+24·v1+66);
    greyscale = v0-ramp, its Paeth duplicate, constant v1, constant
    v1+1 (10·v0+10·v1+25); RGBA = v0-ramp + constant-v1
    (12·v0+12·v1+66); palette = 8 indices over the (v0, v1, v1+1)
    palette (9·v0+15·v1+6). A reconstruction bug anywhere moves
    pixel_sum or a probe byte and hash-diverges.

    Scale: the standard narrow media shape — Arrow-batched
    mapInPandas, bounded per-row decode, payloads never shuffle; the
    fixture cache makes the per-batch cost one encode per distinct
    (v0, v1)."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 0) & (F.length("text") >= 1)
    )

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict[tuple[int, int, int], bytes] = {}

        def png_of(v0: int, v1: int, cls: int) -> bytes:
            key = (v0, v1, cls)
            if key not in cache:
                if cls == 0:  # truecolour RGB, sequential
                    px = (
                        bytes(v0 + i for i in range(12))
                        + bytes([v1]) * 12
                        + bytes([v1]) * 12
                    )
                    cache[key] = encode_png(
                        4, 3, px, row_filters=[0, 1, 2]
                    )
                elif cls == 2:  # RGBA: alpha rides the same filters
                    px = bytes(v0 + i for i in range(12)) + bytes([v1]) * 12
                    cache[key] = encode_png(
                        3, 2, px, color_type=6, row_filters=[0, 1]
                    )
                elif cls == 3:  # palette, Adam7: indices filter, PLTE expands
                    pal = (
                        bytes([v0]) * 3
                        + bytes([v1]) * 3
                        + bytes([v1 + 1]) * 3
                    )
                    idx = bytes([0, 1, 2, 1, 2, 0, 0, 1])
                    cache[key] = encode_png(
                        4, 2, idx, color_type=3, palette=pal,
                        row_filters=[0, 1, 2, 4], interlace=True,
                    )
                else:
                    # ADAM7-interlaced: the 5x4 canvas splits into six
                    # non-empty passes (8 scanlines), each independently
                    # forward-filtered — interlacing is lossless layout,
                    # so the symbolic oracle is unchanged while the
                    # decoder's pass/scatter reconstruction joins the
                    # certified path
                    ramp = bytes(v0 + i for i in range(5))
                    px = (
                        ramp + ramp
                        + bytes([v1]) * 5
                        + bytes([v1 + 1]) * 5
                    )
                    cache[key] = encode_png(
                        5, 4, px, grayscale=True,
                        row_filters=[0, 1, 2, 3, 4, 0, 2, 1],
                        interlace=True,
                    )
            return cache[key]

        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = ascii_seed(text)
                payloads.append(
                    png_of(raw[0], raw[1 % len(raw)], int(doc_id) % 4)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    mm = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "fmt": [], "width": [],
                "height": [], "channels": [], "pixel_sum": [],
                "probe_first": [], "probe_last": [], "decoded": [],
            }
            for payload in pdf["payload"]:
                try:
                    # through the shared sniffer: the boundary wrapper
                    # normalizes corrupt-payload errors to DecodeError
                    w, h, px = decode_image(bytes(payload))
                    ch = len(px) // (w * h)
                    out["fmt"].append(
                        {1: "gray", 2: "ga", 3: "rgb", 4: "rgba"}[ch]
                    )
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(ch)
                    out["pixel_sum"].append(sum(px))
                    out["probe_first"].append(px[0])
                    out["probe_last"].append(px[-1])
                    out["decoded"].append(True)
                except DECODE_FALLBACK_ERRORS:
                    out["fmt"].append("")
                    for k in (
                        "width", "height", "channels", "pixel_sum",
                        "probe_first", "probe_last",
                    ):
                        out[k].append(0)
                    out["decoded"].append(False)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, fmt string, width long, height long, "
        "channels long, pixel_sum long, probe_first long, "
        "probe_last long, decoded boolean",
    )


_AUDIO_ADPCM_ORACLE = """
    WITH m AS (
        SELECT doc_id,
               CAST((ascii(substr(text, 1, 1)) - 128) * 256 AS BIGINT) AS s0,
               CAST((ascii(substr(text,
                     CAST((1 % length(text)) + 1 AS INT), 1)) - 128) * 256
                    AS BIGINT) AS s1
        FROM documents
        WHERE doc_id % 3 = 1 AND length(text) >= 1
    )
    SELECT doc_id,
           CAST(8000 AS BIGINT) AS rate,
           CAST(122 AS BIGINT) AS n_samples,
           s0 AS s_first,
           s1 AS s_last,
           CAST(61 * (s0 + s1) AS BIGINT) AS sample_sum,
           TRUE AS decoded
    FROM m
"""


@_register("multimodal_audio_adpcm_stats", _AUDIO_ADPCM_ORACLE)
def multimodal_audio_adpcm_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COMPRESSED audio decode under the hash gate — IMA ADPCM (WAV
    wFormatTag 0x11, the classic 4-bit compressed WAV every telephony
    and game pipeline shipped): each audio doc's payload is a
    two-block ADPCM stream, and the read path runs the real IMA
    recurrence — per-block header seeding (int16 predictor + step
    index), low-nibble-first code order, step>>3-biased diff
    reconstruction, int16 clamping, index adaptation, fact-chunk trim
    (decode_wav_adpcm). PCM stays with decode_wav; the two refuse each
    other's format tags, same dispatch discipline as the video codecs.

    The symbolic oracle leans on the flat-block exactness contract (the
    audio twin of the flat-JPEG-block rule, pinned per value by
    pytest): a CONSTANT block from stream start round-trips bit-exactly
    because the header carries the value verbatim, every delta
    quantizes to code 0, and at step index 0 the code-0 reconstruction
    adds step>>3 = 0 with the index clamped at 0 — so block 1 decodes
    to 61 copies of s0 and block 2 to 61 copies of s1, every byte
    predicted by DuckDB from the doc text. Real-signal fidelity (44 dB
    steady-state SNR) is pytest-measured, the honest contract of a
    lossy codec. Scale: same narrow-over-scan Arrow shape as every
    media entry — bounded per-row decode, no shuffle."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 1) & (F.length("text") >= 1)
    )

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict[tuple[int, int], bytes] = {}

        def wav_of(s0: int, s1: int) -> bytes:
            if (s0, s1) not in cache:
                cache[(s0, s1)] = encode_wav_adpcm(
                    [s0] * _ADPCM_SPB + [s1] * _ADPCM_SPB, rate=8000
                )
            return cache[(s0, s1)]

        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                raw = ascii_seed(text)
                payloads.append(
                    wav_of(
                        (raw[0] - 128) * 256,
                        (raw[1 % len(raw)] - 128) * 256,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    mm = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "rate": [], "n_samples": [],
                "s_first": [], "s_last": [], "sample_sum": [],
                "decoded": [],
            }
            for payload in pdf["payload"]:
                try:
                    rate, samples = decode_wav_adpcm(bytes(payload))
                    out["rate"].append(rate)
                    out["n_samples"].append(len(samples))
                    out["s_first"].append(samples[0])
                    out["s_last"].append(samples[-1])
                    out["sample_sum"].append(sum(samples))
                    out["decoded"].append(True)
                except DECODE_FALLBACK_ERRORS:
                    for k in (
                        "rate", "n_samples", "s_first", "s_last",
                        "sample_sum",
                    ):
                        out[k].append(0)
                    out["decoded"].append(False)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, rate long, n_samples long, s_first long, "
        "s_last long, sample_sum long, decoded boolean",
    )


_AUDIO_STATS_ORACLE = """
    WITH m AS (
        SELECT doc_id, text, length(text) AS tl
        FROM documents
        WHERE doc_id % 3 = 1 AND length(text) >= 1
    ),
    s AS (
        SELECT doc_id,
               list_transform(range(0, 96), p ->
                   CAST((ascii(substr(text, CAST((p % tl) + 1 AS INT), 1))
                         - 128) * 256 AS BIGINT)) AS samples
        FROM m
    )
    SELECT doc_id,
           CAST(len(samples) AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(samples, x -> x * x)) AS BIGINT)
               AS energy,
           CAST(GREATEST(list_max(samples), -list_min(samples)) AS BIGINT)
               AS peak,
           CAST(list_sum(list_transform(range(1, 96),
               i -> CASE WHEN (samples[i] >= 0) <> (samples[i + 1] >= 0)
                         THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings
    FROM s
"""


@_register("multimodal_audio_stats", _AUDIO_STATS_ORACLE)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO CONTENT ANALYSIS over decoded PCM — the signal statistics
    an audio-corpus pipeline computes after decode and before any
    model: total energy (Σs², the loudness/silence gate), peak
    amplitude (clipping detection), and zero-crossing count (the
    classic cheap voiced/unvoiced + noisiness proxy). Every statistic
    is PURE INTEGER arithmetic over int16 samples — energy ≤ 96·2¹⁵²
    ≈ 10¹¹ « 2⁶³ — so the whole analysis is hash-exact with no float
    contract at all. The pipeline is the real one: with_media_payload
    builds genuine RIFF/WAVE containers, the mapInPandas stage runs
    decode_wav, and the emitted rows are scalars; the oracle replays
    the analysis symbolically from the doc bytes (samples =
    (byte-128)·256, the with_media_payload construction), so the
    DECODER is inside the certified loop exactly like
    multimodal_resize_certified. At 100 TB payload bytes stream
    through Python once and only (doc_id, 4 ints) ever shuffles."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 1) & (F.length("text") >= 1)
    )
    mm = with_media_payload(docs).select("doc_id", "payload")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {"doc_id": [], "n_samples": [], "energy": [],
                   "peak": [], "zero_crossings": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, samples = decode_wav(bytes(payload))
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(samples))
                out["energy"].append(sum(s * s for s in samples))
                out["peak"].append(max(max(samples), -min(samples)))
                out["zero_crossings"].append(
                    sum(
                        1
                        for a, b in zip(samples, samples[1:])
                        if (a >= 0) != (b >= 0)
                    )
                )
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, n_samples long, energy long, peak long, "
        "zero_crossings long",
    )


# ---------------------------------------------------------------------------
# Audio spectrum: DFT dominant-frequency featurization over decoded PCM
# ---------------------------------------------------------------------------


def audio_spectrum(samples: list[int]) -> tuple[int, int, int]:
    """(dominant_bin, dom_power_ppm, n_bins) of an int16 PCM clip via
    the real DFT: dominant_bin = argmax over k >= 1 of |X_k|^2
    (DC excluded — it is offset, not pitch; ties break to the lowest
    bin), dom_power_ppm = that bin's share of non-DC spectral power in
    integer ppm. numpy's rfft is deterministic for identical input;
    the emitted values are integers so downstream certification is
    float-free. Pytest certifies the analysis itself: synthesized
    pure tones land in their exact bin with > 99% of the power, and
    Parseval's identity ties total spectral power back to the
    time-domain energy the certified audio_stats entry computes."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    spec = np.abs(np.fft.rfft(x)) ** 2
    if len(spec) <= 1:
        return 0, 0, int(len(spec))
    body = spec[1:]
    total = float(body.sum())
    k = int(body.argmax()) + 1  # argmax takes the FIRST max: lowest bin
    ppm = int(body[k - 1] * 1_000_000 // total) if total > 0 else 0
    return k, ppm, int(len(spec))


@_register("multimodal_audio_spectrum", None)  # numpy FFT → rows-only
def multimodal_audio_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPECTRAL featurization over decoded PCM — the first genuinely
    frequency-domain stage of the audio ladder (audio_stats is pure
    time-domain): per clip, the dominant DFT bin and its share of
    non-DC power, the cheap pitch/tonality fingerprint an audio corpus
    pipeline computes for language/music/noise routing before any
    model. Same certified plumbing as every multimodal stage: real
    RIFF/WAVE containers from with_media_payload, decode_wav inside
    the Arrow-batched mapInPandas, numpy rfft per clip (96 samples —
    vectorized C, no Python loop over samples), integer-only output
    columns. No SQL oracle can run an FFT, so the entry is rows-only
    BY CONTRACT with the analysis itself pytest-certified (pure-tone
    bin placement + Parseval against the hash-certified energy
    column). At 100 TB: payload bytes stream through Python once;
    (doc_id, 3 ints) is all that ever shuffles; clip-level FFTs are
    embarrassingly parallel and O(n log n) in clip length."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 1) & (F.length("text") >= 1)
    )
    mm = with_media_payload(docs).select("doc_id", "payload")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {"doc_id": [], "n_samples": [], "dominant_bin": [],
                   "dom_power_ppm": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, samples = decode_wav(bytes(payload))
                k, ppm, _nb = audio_spectrum(samples)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(samples))
                out["dominant_bin"].append(k)
                out["dom_power_ppm"].append(ppm)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, n_samples long, dominant_bin long, dom_power_ppm long",
    )


_IMAGE_PNG16_ORACLE = """
    WITH m AS (
        SELECT doc_id, doc_id % 2 AS cls,
               CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS v0,
               CAST(ascii(substr(text,
                    CAST((1 % length(text)) + 1 AS INT), 1)) AS BIGINT)
                   AS v1
        FROM documents
        WHERE doc_id % 3 = 0 AND length(text) >= 1
    )
    SELECT doc_id,
           CAST(CASE cls WHEN 0 THEN 4 ELSE 3 END AS BIGINT) AS width,
           CAST(CASE cls WHEN 0 THEN 3 ELSE 2 END AS BIGINT) AS height,
           CAST(CASE cls WHEN 0 THEN 1 ELSE 4 END AS BIGINT) AS channels,
           CAST(CASE cls
                WHEN 0 THEN 1024 * v0 + 2048 * v1 + 10
                ELSE 3072 * v0 + 3084 * v1 + 31 END AS BIGINT)
               AS sample_sum,
           CAST(256 * v0 AS BIGINT) AS s_first,
           CAST(CASE cls WHEN 0 THEN 256 * v1 + 1
                ELSE 257 * v1 END AS BIGINT) AS s_last,
           CAST(CASE cls WHEN 0 THEN 4 * v0 + 8 * v1
                ELSE 12 * v0 + 12 * v1 END AS BIGINT) AS hi_sum,
           TRUE AS decoded
    FROM m
"""


@_register("multimodal_image_png16_stats", _IMAGE_PNG16_ORACLE)
def multimodal_image_png16_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """16-BIT PNG decode under the hash gate (r13 VERDICT item 5 —
    the depth residual): each image doc's payload is a real 16-bit
    PNG whose big-endian sample pairs ride the SAME five-filter
    reconstruction as 8-bit lanes (filters offset by BYTES per pixel,
    spec §6.2 — bpp 2 for grey, 8 for RGBA), rotating by doc_id%2
    through a sequential 16-bit GREYSCALE (filters None/Sub/Up over a
    ramp whose low bytes count 0..3 while high bytes carry v0/v1 —
    any hi/lo lane mix-up moves sample_sum by 255x) and an
    ADAM7-INTERLACED 16-bit RGBA (four passes on a 3x2 canvas,
    filters None/Sub/Up/Paeth, low bytes cycling j%7 so pass
    scattering is position-sensitive). PNG is lossless at any depth,
    so the symbolic oracle predicts every 16-bit sample from the doc
    text; hi_sum re-decodes through the SHARED decode_image dispatch
    and certifies the default MSB reduction (spec §13.12) that every
    8-bit consumer of a mixed-depth corpus sees.

    Scale: identical narrow media shape — Arrow-batched mapInPandas,
    bounded per-row decode (16-bit doubles bytes, the allocation cap
    accounts for it), payloads never shuffle."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 0) & (F.length("text") >= 1)
    )

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict[tuple[int, int, int], bytes] = {}

        def png16_of(v0: int, v1: int, cls: int) -> bytes:
            key = (v0, v1, cls)
            if key not in cache:
                if cls == 0:  # 16-bit greyscale, sequential
                    samples = (
                        [v0 * 256 + i for i in range(4)]
                        + [v1 * 256] * 4
                        + [v1 * 256 + 1] * 4
                    )
                    px = b"".join(
                        struct.pack(">H", s) for s in samples
                    )
                    cache[key] = encode_png(
                        4, 3, px, grayscale=True, depth=16,
                        row_filters=[0, 1, 2],
                    )
                else:  # 16-bit RGBA, Adam7 (4 non-empty passes on 3x2)
                    samples = (
                        [v0 * 256 + (j % 7) for j in range(12)]
                        + [v1 * 257] * 12
                    )
                    px = b"".join(
                        struct.pack(">H", s) for s in samples
                    )
                    cache[key] = encode_png(
                        3, 2, px, color_type=6, depth=16,
                        interlace=True, row_filters=[0, 1, 2, 4],
                    )
            return cache[key]

        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = ascii_seed(text)
                payloads.append(
                    png16_of(raw[0], raw[1 % len(raw)], int(doc_id) % 2)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    mm = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "width": [], "height": [],
                "channels": [], "sample_sum": [], "s_first": [],
                "s_last": [], "hi_sum": [], "decoded": [],
            }
            for payload in pdf["payload"]:
                try:
                    b = bytes(payload)
                    w, h, px = decode_png(b, raw16=True)
                    ch = len(px) // (w * h * 2)
                    samples = [
                        (px[i] << 8) | px[i + 1]
                        for i in range(0, len(px), 2)
                    ]
                    # the shared dispatch path: default MSB reduction
                    _w2, _h2, red = decode_image(b)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(ch)
                    out["sample_sum"].append(sum(samples))
                    out["s_first"].append(samples[0])
                    out["s_last"].append(samples[-1])
                    out["hi_sum"].append(sum(red))
                    out["decoded"].append(True)
                except DECODE_FALLBACK_ERRORS:
                    for k in (
                        "width", "height", "channels", "sample_sum",
                        "s_first", "s_last", "hi_sum",
                    ):
                        out[k].append(0)
                    out["decoded"].append(False)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, width long, height long, channels long, "
        "sample_sum long, s_first long, s_last long, hi_sum long, "
        "decoded boolean",
    )


_IMAGE_PNG_TRNS_ORACLE = """
    WITH m AS (
        SELECT doc_id, doc_id % 2 AS cls,
               CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS v0,
               CAST(ascii(substr(text,
                    CAST((1 % length(text)) + 1 AS INT), 1)) AS BIGINT)
                   AS v1
        FROM documents
        WHERE doc_id % 3 = 1 AND length(text) >= 1
    )
    SELECT doc_id,
           CAST(CASE cls WHEN 0 THEN 4 ELSE 3 END AS BIGINT) AS width,
           CAST(2 AS BIGINT) AS height,
           CAST(CASE cls WHEN 0 THEN 2 ELSE 4 END AS BIGINT) AS channels,
           CAST(CASE cls WHEN 0 THEN 3 * v0 + 2 * v1 + 1875
                ELSE 2 * v0 + 2 * v1 + 3833 END AS BIGINT) AS pixel_sum,
           CAST(CASE cls WHEN 0 THEN 3 ELSE 2 END AS BIGINT)
               AS n_transparent,
           CAST(CASE cls WHEN 0 THEN 255 ELSE 0 END AS BIGINT) AS a_first,
           TRUE AS decoded
    FROM m
"""


@_register("multimodal_image_png_trns_stats", _IMAGE_PNG_TRNS_ORACLE)
def multimodal_image_png_trns_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PNG COLOUR-KEY transparency under the hash gate (r13 VERDICT
    item 5's optional half, closing the last PNG residual): grey and
    RGB images whose tRNS chunk names ONE sample value (spec
    §11.3.2.1) decode with a synthesized alpha channel — exactly-
    matching pixels transparent, everything else full-scale opaque —
    so grey expands to grey+alpha and RGB to RGBA through the same
    five-filter reconstruction. The fixtures plant key values ABOVE
    the 7-bit range (200/201/202): ascii_seed guarantees only
    isascii() — control characters are admissible heads — so
    text-derived samples are <= 127 and provably can never collide
    with the key, keeping the match count corpus-independent
    arithmetic (r14 review; the original key 7 was collidable by a
    BEL-headed document): a 4x2 grey image with three key pixels
    (filters None/Up) and a 3x2 RGB image with two key pixels
    (filters Sub/Paeth, one pixel a near-miss differing only in its
    last sample — an equality-on-ALL-samples probe). pixel_sum covers
    grey/rgb AND alpha bytes, n_transparent counts synthesized zero
    alphas, a_first pins the first pixel's alpha either way.

    Scale: the standard narrow media shape — Arrow-batched
    mapInPandas, bounded per-row decode, payloads never shuffle."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 1) & (F.length("text") >= 1)
    )

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict[tuple[int, int, int], bytes] = {}

        def png_of(v0: int, v1: int, cls: int) -> bytes:
            key = (v0, v1, cls)
            if key not in cache:
                if cls == 0:  # grey + colour-key 200 (> any ASCII byte)
                    px = bytes([v0, 200, v1, 200, 200, v0, v1, v0])
                    cache[key] = encode_png(
                        4, 2, px, grayscale=True, row_filters=[0, 2],
                        transparency=struct.pack(">H", 200),
                    )
                else:  # RGB + colour-key (200, 201, 202)
                    px = bytes(
                        [200, 201, 202, v0, v1, 200, 200, 201, v0,
                         200, 201, 202, v1, 201, 202, 202, 201, 200]
                    )
                    cache[key] = encode_png(
                        3, 2, px, color_type=2, row_filters=[1, 4],
                        transparency=struct.pack(">HHH", 200, 201, 202),
                    )
            return cache[key]

        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = ascii_seed(text)
                payloads.append(
                    png_of(raw[0], raw[1 % len(raw)], int(doc_id) % 2)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    mm = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "width": [], "height": [],
                "channels": [], "pixel_sum": [], "n_transparent": [],
                "a_first": [], "decoded": [],
            }
            for payload in pdf["payload"]:
                try:
                    # the shared sniffer routes by magic; alpha is
                    # synthesized by the colour-key expansion
                    w, h, px = decode_image(bytes(payload))
                    ch = len(px) // (w * h)
                    alphas = px[ch - 1 :: ch]
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(ch)
                    out["pixel_sum"].append(sum(px))
                    out["n_transparent"].append(
                        sum(1 for a in alphas if a == 0)
                    )
                    out["a_first"].append(alphas[0])
                    out["decoded"].append(True)
                except DECODE_FALLBACK_ERRORS:
                    for k in (
                        "width", "height", "channels", "pixel_sum",
                        "n_transparent", "a_first",
                    ):
                        out[k].append(0)
                    out["decoded"].append(False)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, width long, height long, channels long, "
        "pixel_sum long, n_transparent long, a_first long, "
        "decoded boolean",
    )


_IMAGE_PNG_LOWDEPTH_ORACLE = """
    WITH m AS (
        SELECT doc_id, doc_id % 2 AS cls,
               CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS v0,
               CAST(ascii(substr(text,
                    CAST((1 % length(text)) + 1 AS INT), 1)) AS BIGINT)
                   AS v1
        FROM documents
        WHERE doc_id % 3 = 2 AND length(text) >= 1
    )
    SELECT doc_id,
           CAST(CASE cls WHEN 0 THEN 6 ELSE 8 END AS BIGINT) AS width,
           CAST(2 AS BIGINT) AS height,
           CAST(CASE cls WHEN 0 THEN 1 ELSE 4 END AS BIGINT) AS channels,
           CAST(CASE cls
                WHEN 0 THEN 102 * (v0 % 16) + 102 * (v1 % 16)
                ELSE 12 * v0 + 24 * v1 + 2984 END AS BIGINT)
               AS pixel_sum,
           CAST(CASE cls WHEN 0 THEN 17 * (v0 % 16) ELSE v0 END
                AS BIGINT) AS probe_first,
           CAST(CASE cls WHEN 0 THEN 17 * (v0 % 16) ELSE 200 END
                AS BIGINT) AS probe_last,
           TRUE AS decoded
    FROM m
"""


@_register("multimodal_image_png_lowdepth_stats", _IMAGE_PNG_LOWDEPTH_ORACLE)
def multimodal_image_png_lowdepth_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BIT-PACKED PNG decode under the hash gate — depths 1/2/4
    complete the codec's depth matrix (r14; the r13 refusal narrowed
    to spec-illegal combinations only). Scanline filters operate on
    the PACKED bytes (spec §6.2, bpp floored at one byte), samples
    unpack MSB-first per row, greys rescale by the EXACT 255/85/17
    multipliers (spec §13.12): doc_id%2 rotates a 4-BIT GREYSCALE
    (6x2 sequential, filters None/Up, nibbles from the text head mod
    16 — any packing/unpacking slip moves pixel_sum by the 17x
    multiplier) and a 2-BIT PALETTE laid out ADAM7 across five
    single-row passes exercising ALL FIVE filters on packed bytes,
    expanded through a v0/v1-derived PLTE with a tRNS alpha table to
    RGBA (fixed index pattern, so per-index occupancy is corpus-
    independent arithmetic). The symbolic oracle predicts every
    decoded byte; probes pin the first sample and the last alpha.

    Scale: the standard narrow media shape — Arrow-batched
    mapInPandas through the shared dispatch, bounded per-row decode,
    payloads never shuffle."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 2) & (F.length("text") >= 1)
    )

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict[tuple[int, int, int], bytes] = {}

        def png_of(v0: int, v1: int, cls: int) -> bytes:
            key = (v0, v1, cls)
            if key not in cache:
                if cls == 0:  # 4-bit grey, sequential
                    a, b = v0 % 16, v1 % 16
                    samples = bytes([a, b] * 3 + [b, a] * 3)
                    cache[key] = encode_png(
                        6, 2, samples, grayscale=True, depth=4,
                        row_filters=[0, 2],
                    )
                else:  # 2-bit palette, Adam7 (5 passes), tRNS -> RGBA
                    pal = (
                        bytes([v0]) * 3
                        + bytes([v1]) * 3
                        + bytes([v1 + 1]) * 3
                        + bytes([7, 8, 9])
                    )
                    idx = bytes(
                        [0, 1, 2, 3, 3, 2, 1, 0, 1, 0, 3, 2, 2, 3, 0, 1]
                    )
                    cache[key] = encode_png(
                        8, 2, idx, color_type=3, depth=2, palette=pal,
                        transparency=bytes([9, 200]),
                        interlace=True, row_filters=[0, 1, 2, 3, 4],
                    )
            return cache[key]

        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = ascii_seed(text)
                payloads.append(
                    png_of(raw[0], raw[1 % len(raw)], int(doc_id) % 2)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    mm = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"], "width": [], "height": [],
                "channels": [], "pixel_sum": [], "probe_first": [],
                "probe_last": [], "decoded": [],
            }
            for payload in pdf["payload"]:
                try:
                    w, h, px = decode_image(bytes(payload))
                    ch = len(px) // (w * h)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(ch)
                    out["pixel_sum"].append(sum(px))
                    out["probe_first"].append(px[0])
                    out["probe_last"].append(px[-1])
                    out["decoded"].append(True)
                except DECODE_FALLBACK_ERRORS:
                    for k in (
                        "width", "height", "channels", "pixel_sum",
                        "probe_first", "probe_last",
                    ):
                        out[k].append(0)
                    out["decoded"].append(False)
            yield pd.DataFrame(out)

    return fan_out(mm, min_parallelism=8).mapInPandas(
        batches,
        "doc_id long, width long, height long, channels long, "
        "pixel_sum long, probe_first long, probe_last long, "
        "decoded boolean",
    )
