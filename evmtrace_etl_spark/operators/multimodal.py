"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Five formats are decoded for REAL with stdlib-only codecs: WAV
(RIFF/PCM16, chunk-walking parser), BMP (24-bit BI_RGB, bottom-up
rows, 4-byte row padding), PPM (P6, comment-tolerant header
tokenizer), PNG (8-bit RGB non-interlaced: CRC-checked chunk walk,
multi-IDAT ``zlib`` inflate, full None/Sub/Up/Average/Paeth scanline
reconstruction) and MP4 (ISO BMFF container demux: recursive box
walk with 64-bit ``largesize`` support, ``mvhd``/``mdhd`` timing,
``stts`` deltas, ``stsz`` sample sizes cross-checked against the
``mdat`` payload, per-sample slicing).  Decoding the video *frames*
inside MP4 samples would need an external codec (H.264 etc.), but the
container layer — the part a data pipeline actually touches for
metadata, sampling and slicing — is plain ``struct`` parsing, done
for real here.  Everything Spark-side is real and tested: the schema,
the binary column, the Arrow batch shape, the ``mapInPandas``
signature, and the partition behavior.

Scale notes: media blobs ride in parquet binary columns; feature
extraction is a narrow ``mapInPandas`` (one pass, no shuffle, Arrow
batches sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``).
At 100 TB the only metadata shuffle is the final small rollup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ["image/png", "audio/wav", "video/mp4"]

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("fake_feature", DoubleType()),
    ]
)


#: Formats in the real-codec rollup corpus (``doc_id % 3`` order).
#: PNG and MP4 have their own corpora (``as_png_media_table`` /
#: ``as_mp4_media_table``) — all five formats decode for real.
REAL_MEDIA_TYPES = ["image/bmp", "audio/wav", "image/ppm"]


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + PCM16 mono data chunk."""
    import struct

    data = struct.pack("<%dh" % len(samples), *samples)
    return (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF",
            36 + len(data),
            b"WAVE",
            b"fmt ",
            16,
            1,  # PCM
            1,  # mono
            sample_rate,
            sample_rate * 2,
            2,
            16,
            b"data",
            len(data),
        )
        + data
    )


def decode_wav(blob: bytes) -> dict:
    """Chunk-walking RIFF parser (doesn't assume the canonical layout:
    skips unknown chunks, honors the odd-size pad byte), PCM16 only.

    Returns kind/sample_rate/n_channels/bits/samples (exact ints)."""
    import struct

    riff, _, wave = struct.unpack_from("<4sI4s", blob, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    off, sr, channels, bits, samples = 12, None, None, None, None
    while off + 8 <= len(blob):
        cid, csz = struct.unpack_from("<4sI", blob, off)
        off += 8
        if cid == b"fmt ":
            audio_fmt, channels, sr, _, _, bits = struct.unpack_from(
                "<HHIIHH", blob, off
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif cid == b"data":
            samples = list(struct.unpack_from("<%dh" % (csz // 2), blob, off))
        off += csz + (csz & 1)  # chunks are word-aligned
    if sr is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return {
        "kind": "audio",
        "sample_rate": sr,
        "n_channels": channels,
        "bits": bits,
        "samples": samples,
    }


def encode_bmp(width: int, height: int, pixels) -> bytes:
    """24-bit BI_RGB BMP: BGR byte order, bottom-up rows, rows padded
    to 4 bytes.  ``pixels`` = list of (r, g, b), top-down row-major."""
    import struct

    stride = (3 * width + 3) // 4 * 4
    img = bytearray()
    for y in range(height - 1, -1, -1):
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))
        row += b"\x00" * (stride - len(row))
        img += row
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(img),
            2835, 2835, 0, 0,
        )
        + bytes(img)
    )


def decode_bmp(blob: bytes) -> dict:
    """BITMAPINFOHEADER parser for 24-bit uncompressed BMPs; undoes the
    BGR order, the bottom-up row order (top-down when height < 0), and
    the 4-byte row padding.  Returns exact (r, g, b) pixels, top-down
    row-major."""
    import struct

    sig, _, _, _, data_off = struct.unpack_from("<2sIHHI", blob, 0)
    if sig != b"BM":
        raise ValueError("not a BMP blob")
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", blob, 14)
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit BI_RGB supported")
    height, bottom_up = abs(h), h > 0
    stride = (3 * w + 3) // 4 * 4
    pixels = [None] * (w * height)
    for row_i in range(height):
        y = (height - 1 - row_i) if bottom_up else row_i
        base = data_off + row_i * stride
        for x in range(w):
            b, g, r = blob[base + 3 * x : base + 3 * x + 3]
            pixels[y * w + x] = (r, g, b)
    return {"kind": "image", "width": w, "height": height, "pixels": pixels}


def encode_ppm(width: int, height: int, pixels) -> bytes:
    """Binary PPM (P6), maxval 255.  ``pixels`` as in ``encode_bmp``."""
    return f"P6\n{width} {height}\n255\n".encode() + bytes(
        v for px in pixels for v in px
    )


def decode_ppm(blob: bytes) -> dict:
    """P6 parser with a spec-correct header tokenizer (arbitrary
    whitespace, ``#`` comments).  Returns exact pixels, top-down."""
    tokens, pos = [], 0
    while len(tokens) < 4:
        if pos >= len(blob):
            raise ValueError("truncated PPM header")
        c = blob[pos : pos + 1]
        if c == b"#":
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(blob) and not blob[pos : pos + 1].isspace():
                pos += 1
            tokens.append(blob[start:pos])
    if tokens[0] != b"P6":
        raise ValueError("not a P6 PPM")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    pos += 1  # exactly one whitespace byte after maxval
    raster = blob[pos : pos + 3 * w * h]
    pixels = [
        (raster[3 * i], raster[3 * i + 1], raster[3 * i + 2])
        for i in range(w * h)
    ]
    return {"kind": "image", "width": w, "height": h, "pixels": pixels}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, pixels) -> bytes:
    """Real PNG (8-bit RGB, no interlace): zlib-deflated scanlines with
    filter type 0, CRC32-checked chunks.  ``pixels`` as in
    ``encode_bmp``."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 (None)
        for x in range(width):
            raw += bytes(pixels[y * width + x])
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> dict:
    """Spec-correct PNG reader for the 8-bit RGB non-interlaced
    profile: chunk walk with CRC verification, multi-IDAT inflate, and
    full scanline-filter reconstruction (None/Sub/Up/Average/Paeth) —
    so PNGs from ANY conforming encoder decode, not just
    ``encode_png``'s filter-0 output.  Returns exact pixels,
    top-down."""
    import struct
    import zlib

    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG blob")
    off, idat, meta = 8, bytearray(), None
    while off + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, off)
        tag = blob[off + 4 : off + 8]
        payload = blob[off + 8 : off + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, off + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        off += 12 + length
    if meta is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, _, _, interlace = meta
    if (depth, color, interlace) != (8, 2, 0):
        raise ValueError("only 8-bit RGB non-interlaced PNG supported")
    raw = zlib.decompress(bytes(idat))
    stride, bpp = 3 * w, 3
    pixels: list = [None] * (w * h)
    prev = bytearray(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0  # left (reconstructed)
            b = prev[i]  # up
            c = prev[i - bpp] if i >= bpp else 0  # up-left
            if ftype == 0:
                pass
            elif ftype == 1:  # Sub
                line[i] = (line[i] + a) & 0xFF
            elif ftype == 2:  # Up
                line[i] = (line[i] + b) & 0xFF
            elif ftype == 3:  # Average
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif ftype == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
            else:
                raise ValueError(f"unknown filter type {ftype}")
        for x in range(w):
            pixels[y * w + x] = (
                line[3 * x], line[3 * x + 1], line[3 * x + 2]
            )
        prev = line
    return {"kind": "image", "width": w, "height": h, "pixels": pixels}


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_box(tag: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _mp4_full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    import struct

    return _mp4_box(tag, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


#: Identity transform matrix used by mvhd/tkhd (16.16 / 2.30 fixed).
_MP4_MATRIX = (0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def encode_mp4(
    duration: int,
    sample_sizes: list,
    fill: int,
    timescale: int = 600,
    sample_delta: int = 100,
) -> bytes:
    """Minimal but conforming ISO BMFF (MP4) file: ``ftyp`` + a full
    ``moov`` tree (``mvhd``, ``trak/tkhd``, ``mdia/mdhd/hdlr``,
    ``minf/vmhd/dinf/stbl`` with ``stsd/stts/stsc/stsz/stco``) + one
    ``mdat`` chunk whose payload is ``fill``-byte samples laid out per
    ``sample_sizes``.  Any conforming BMFF demuxer can read it."""
    import struct

    n = len(sample_sizes)
    payload = b"".join(bytes([fill % 256]) * s for s in sample_sizes)

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp42")
    mvhd = _mp4_full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", *_MP4_MATRIX)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _mp4_full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", *_MP4_MATRIX)
        + struct.pack(">II", 16 << 16, 16 << 16),
    )
    mdhd = _mp4_full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, n * sample_delta)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _mp4_full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _mp4_full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _mp4_full(
        b"dref", 0, 0, struct.pack(">I", 1) + _mp4_full(b"url ", 0, 1, b"")
    )
    dinf = _mp4_box(b"dinf", dref)
    # VisualSampleEntry ('mp4v'), 16x16, no codec config — container
    # conformance only; the raster inside samples is synthetic fill.
    sample_entry = _mp4_box(
        b"mp4v",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", 16, 16)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _mp4_full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _mp4_full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    stsc = _mp4_full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _mp4_full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + struct.pack(">%dI" % n, *sample_sizes),
    )
    stbl_wo_stco = stsd + stts + stsc + stsz
    # stco holds the absolute file offset of the mdat payload: everything
    # before it is ftyp + moov (whose size includes the 20-byte stco) + 8.
    stbl_len = 8 + len(stbl_wo_stco) + 20
    minf_len = 8 + len(vmhd) + len(dinf) + stbl_len
    mdia_len = 8 + len(mdhd) + len(hdlr) + minf_len
    trak_len = 8 + len(tkhd) + mdia_len
    moov_len = 8 + len(mvhd) + trak_len
    mdat_payload_off = len(ftyp) + moov_len + 8
    stco = _mp4_full(b"stco", 0, 0, struct.pack(">II", 1, mdat_payload_off))
    stbl = _mp4_box(b"stbl", stbl_wo_stco + stco)
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    mdat = _mp4_box(b"mdat", payload)
    assert len(moov) == moov_len  # stco offset stays self-consistent
    return ftyp + moov + mdat


def decode_mp4(blob: bytes) -> dict:
    """ISO BMFF container demux, stdlib-only: recursive box walk
    (``size == 1`` 64-bit largesize and ``size == 0`` to-EOF forms
    handled, unknown boxes skipped), ``mvhd``/``mdhd`` v0+v1 timing,
    ``stts`` total ticks, ``stsz`` sample sizes (uniform and per-sample
    forms) cross-checked against the ``mdat`` payload length, and
    per-sample payload slices.  Supported profile: samples laid out
    contiguously across the mdat boxes in file order — stco/stsc
    chunk scatter is not reconstructed, and the stsz-vs-mdat length
    cross-check catches payloads that don't add up (a same-length
    reordering is outside the profile).  Frame pixel decode would
    need an external video codec; the container layer is decoded for
    real."""
    import struct

    out: dict = {"kind": "video", "mdat": b""}

    def walk(buf: bytes, start: int, end: int) -> None:
        off = start
        while off + 8 <= end:
            (size,) = struct.unpack_from(">I", buf, off)
            tag = buf[off + 4 : off + 8]
            body = off + 8
            if size == 1:
                (size,) = struct.unpack_from(">Q", buf, off + 8)
                body = off + 16
            elif size == 0:
                size = end - off
            if size < 8 or off + size > end:
                raise ValueError(f"bad box size {size} for {tag!r}")
            if tag in _MP4_CONTAINERS:
                walk(buf, body, off + size)
            elif tag in (b"mvhd", b"mdhd"):
                version = buf[body]
                if version == 1:
                    ts, dur = struct.unpack_from(">IQ", buf, body + 4 + 16)
                else:
                    _, _, ts, dur = struct.unpack_from(">IIII", buf, body + 4)
                key = "timescale" if tag == b"mvhd" else "media_timescale"
                dkey = "duration" if tag == b"mvhd" else "media_duration"
                out[key], out[dkey] = ts, dur
            elif tag == b"stts":
                (count,) = struct.unpack_from(">I", buf, body + 4)
                ticks = 0
                for i in range(count):
                    c, d = struct.unpack_from(">II", buf, body + 8 + 8 * i)
                    ticks += c * d
                out["total_ticks"] = ticks
            elif tag == b"stsz":
                uniform, count = struct.unpack_from(">II", buf, body + 4)
                if uniform:
                    out["sample_sizes"] = [uniform] * count
                else:
                    out["sample_sizes"] = list(
                        struct.unpack_from(">%dI" % count, buf, body + 12)
                    )
            elif tag == b"mdat":
                # accumulate in file order: progressive files may carry
                # several mdat boxes; sample slicing below assumes the
                # samples are laid out contiguously across them (the
                # profile this demuxer supports — stco/stsc chunk
                # scatter is not reconstructed)
                out["mdat"] += buf[body : off + size]
            off += size

    walk(blob, 0, len(blob))
    if (
        "timescale" not in out
        or "sample_sizes" not in out
        or "total_ticks" not in out
    ):
        raise ValueError("missing mvhd/stsz/stts box")
    if sum(out["sample_sizes"]) != len(out["mdat"]):
        raise ValueError("stsz total does not match mdat payload")
    slices, pos = [], 0
    for s in out["sample_sizes"]:
        slices.append(out["mdat"][pos : pos + s])
        pos += s
    out["samples"] = slices
    return out


def decode_media(blob: bytes, media_type: str) -> dict:
    """Real decode for the stdlib-codec formats: WAV/BMP/PPM/PNG (PNG
    needs only stdlib ``zlib``) and MP4 at the ISO-BMFF container
    level (timing, sample table, per-sample payload slices — frame
    pixel decode would need an external video codec)."""
    if media_type == "audio/wav":
        return decode_wav(blob)
    if media_type == "image/bmp":
        return decode_bmp(blob)
    if media_type == "image/ppm":
        return decode_ppm(blob)
    if media_type == "image/png":
        return decode_png(blob)
    if media_type == "video/mp4":
        return decode_mp4(blob)
    raise NotImplementedError(f"no stdlib codec for {media_type}")


def as_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from documents: the text
    bytes stand in for the blob; media_type cycles by doc_id.

    Output: doc_id, media (binary), media_type, meta (struct<n_bytes>).
    """
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    media = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        mt.alias("media_type"),
        F.struct(F.length(media).cast("long").alias("n_bytes")).alias("meta"),
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    The per-blob 'feature' is a deterministic fake — ``(n_bytes % 997) /
    997.0`` — standing in for a decoder output so the plumbing (batch
    iteration, binary handling, schema) is fully exercised and
    oracle-checkable.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            n_bytes = pdf["media"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "content_md5": pdf["media"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "fake_feature": (n_bytes % 997) / 997.0,
                }
            )

    return media.mapInPandas(_extract, schema=MEDIA_FEATURE_SCHEMA)


MEDIA_PART_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("part_kind", StringType()),
        StructField("part_idx", LongType()),
        StructField("part_md5", StringType()),
        StructField("part_bytes", LongType()),
    ]
)


def decode_media_parts(media: DataFrame, n_frames: int = 3) -> DataFrame:
    """1→N media decode (frame-sample / resize / clip), Arrow-batched.

    Per media row: video → ``n_frames`` sampled frame rows, image → one
    resized-thumbnail row, audio → one clip row.  This exemplar runs on
    the FAKE corpus (text bytes as blobs), so each part's payload is a
    deterministic stand-in — md5 of the blob plus a part tag — while
    the Spark-side shape is the real one: a ``mapInPandas`` UDTF that
    fans one binary row out to N typed part rows, no shuffle.  The
    REAL versions of these transforms over genuinely decoded media are
    ``media_thumbnails`` (box-filter resize + audio clip) and
    ``media_frame_samples`` (MP4 mdat sample slicing).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in MEDIA_PART_SCHEMA}

            def emit(doc_id, mt, kind, idx, blob):
                tag = f"#{idx}" if kind == "frame" else f"#{kind}"
                out["doc_id"].append(doc_id)
                out["media_type"].append(mt)
                out["part_kind"].append(kind)
                out["part_idx"].append(idx)
                out["part_md5"].append(
                    hashlib.md5(blob + tag.encode()).hexdigest()
                )
                out["part_bytes"].append(len(blob))

            for doc_id, mt, blob in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media"]
            ):
                b = bytes(blob)
                if mt == "video/mp4":
                    for i in range(n_frames):
                        emit(doc_id, mt, "frame", i, b)
                elif mt == "image/png":
                    emit(doc_id, mt, "thumb", 0, b)
                else:
                    emit(doc_id, mt, "clip", 0, b)
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode, schema=MEDIA_PART_SCHEMA)


def synth_media_params(doc_id: int) -> dict:
    """Deterministic synthesis parameters for the real-codec corpus —
    the single source of truth shared by the encoder, the unit tests,
    and (as closed-form SQL) the DuckDB oracle.  All sums below have
    closed forms so the oracle needs no per-sample lateral join:
    image channels are flat per channel (pixel-ORDER correctness is
    pinned by exact round-trip unit tests instead), audio samples are
    ``base + (i % 97)`` whose prefix sums telescope.
    """
    return {
        "kind": doc_id % 3,  # 0=bmp, 1=wav, 2=ppm
        "w": 4 + doc_id % 13,
        "h": 3 + doc_id % 7,
        "n": 64 + doc_id % 129,
        "pr": doc_id % 256,
        "pg": (doc_id * 7) % 256,
        "pb": (doc_id * 13) % 256,
        "base": doc_id % 97,
    }


def synth_media_blob(doc_id: int) -> tuple:
    """(media_type, blob): a REAL WAV/BMP/PPM file built from
    ``synth_media_params``, decodable by any conforming reader."""
    p = synth_media_params(doc_id)
    if p["kind"] == 1:
        samples = [p["base"] + (i % 97) for i in range(p["n"])]
        return "audio/wav", encode_wav(samples)
    pixels = [(p["pr"], p["pg"], p["pb"])] * (p["w"] * p["h"])
    if p["kind"] == 0:
        return "image/bmp", encode_bmp(p["w"], p["h"], pixels)
    return "image/ppm", encode_ppm(p["w"], p["h"], pixels)


REAL_MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("media", BinaryType()),
    ]
)

REAL_MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("n_units", LongType()),
        StructField("value_sum", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def as_real_media_table(docs: DataFrame) -> DataFrame:
    """Synthesize the real-codec media corpus: one genuine WAV/BMP/PPM
    blob per document, cycling by ``doc_id % 3``.  Narrow
    ``mapInPandas`` (no shuffle); at 100 TB the blobs would arrive in
    parquet binary columns and this stage disappears."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [synth_media_blob(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": [mt for mt, _ in pairs],
                    "media": [blob for _, blob in pairs],
                }
            )

    return docs.select("doc_id").mapInPandas(_synth, schema=REAL_MEDIA_SCHEMA)


def extract_real_media_features(media: DataFrame) -> DataFrame:
    """REAL decode over the binary column: every blob is parsed by the
    stdlib codec (``decode_media``), not a stand-in — n_units / sums
    come from the decoded pixels/samples, n_bytes from the raw blob.
    Audio rows carry NULL channel sums.  Narrow ``mapInPandas``."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                f.name: [] for f in REAL_MEDIA_FEATURE_SCHEMA
            }
            for doc_id, mt, blob in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media"]
            ):
                d = decode_media(bytes(blob), mt)
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                out["n_bytes"].append(len(blob))
                if d["kind"] == "audio":
                    out["n_units"].append(len(d["samples"]))
                    out["value_sum"].append(sum(d["samples"]))
                    out["sum_r"].append(None)
                    out["sum_g"].append(None)
                    out["sum_b"].append(None)
                else:
                    px = d["pixels"]
                    sr = sum(p[0] for p in px)
                    sg = sum(p[1] for p in px)
                    sb = sum(p[2] for p in px)
                    out["n_units"].append(d["width"] * d["height"])
                    out["value_sum"].append(sr + sg + sb)
                    out["sum_r"].append(sr)
                    out["sum_g"].append(sg)
                    out["sum_b"].append(sb)
            yield pd.DataFrame(out).astype(
                {
                    c: "Int64"
                    for c in (
                        "n_bytes", "n_units", "value_sum",
                        "sum_r", "sum_g", "sum_b",
                    )
                }
            )

    return media.mapInPandas(_extract, schema=REAL_MEDIA_FEATURE_SCHEMA)


def real_media_rollup(docs: DataFrame) -> DataFrame:
    """Per-media-type rollup of REAL-decoded features: encode →
    struct-level decode → aggregate.  The DuckDB oracle reproduces
    every total in closed form from ``synth_media_params``, so a
    codec bug anywhere (header layout, row padding, channel order
    sums, sample widths, chunk walking) breaks the hash match."""
    feats = extract_real_media_features(as_real_media_table(docs))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("n_units").alias("total_units"),
        F.sum("value_sum").alias("value_total"),
        F.sum("sum_r").alias("r_total"),
        F.sum("sum_g").alias("g_total"),
        F.sum("sum_b").alias("b_total"),
    )


def as_png_media_table(docs: DataFrame) -> DataFrame:
    """Real-PNG corpus: one genuine deflate-compressed PNG per document
    (same deterministic pixel parameters as the BMP/PPM legs, so
    decoded sums stay closed-form even though the COMPRESSED byte size
    is not)."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                p = synth_media_params(int(d))
                blobs.append(
                    encode_png(
                        p["w"], p["h"],
                        [(p["pr"], p["pg"], p["pb"])] * (p["w"] * p["h"]),
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": ["image/png"] * len(blobs),
                    "media": blobs,
                }
            )

    return docs.select("doc_id").mapInPandas(_synth, schema=REAL_MEDIA_SCHEMA)


def png_media_rollup(docs: DataFrame) -> DataFrame:
    """Whole-corpus PNG round-trip: encode (filter-0 + deflate) →
    spec-level decode (CRC walk, inflate, filter reconstruction) →
    rollup of decoded sums.  The oracle recomputes every total in
    closed form from ``synth_media_params``; byte size is excluded
    (deflate output length has no closed form)."""
    feats = extract_real_media_features(as_png_media_table(docs))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_units").alias("total_units"),
        F.sum("value_sum").alias("value_total"),
        F.sum("sum_r").alias("r_total"),
        F.sum("sum_g").alias("g_total"),
        F.sum("sum_b").alias("b_total"),
    )


def synth_mp4_params(doc_id: int) -> dict:
    """Deterministic MP4 synthesis parameters — single source of truth
    for the encoder, the unit tests, and (as closed-form SQL) the
    DuckDB oracle.  Sample sizes ``sbase + (i % 13)`` telescope; the
    mdat payload is a constant ``fill`` byte per doc so its value sum
    is ``sizes_sum * fill`` (payload VARIETY is pinned by round-trip
    unit tests instead)."""
    n = 5 + doc_id % 11
    sbase = 10 + doc_id % 29
    return {
        "duration": 600 * (1 + doc_id % 7),  # mvhd ticks, timescale 600
        "n": n,
        "sizes": [sbase + (i % 13) for i in range(n)],
        "fill": doc_id % 251,
    }


def synth_mp4_blob(doc_id: int) -> bytes:
    p = synth_mp4_params(doc_id)
    return encode_mp4(p["duration"], p["sizes"], p["fill"])


#: Encoder byte overhead: everything except the 4-bytes-per-sample stsz
#: table and the mdat payload is fixed-size, so
#: ``len(blob) == MP4_OVERHEAD + 4*n + sum(sizes)``.  Computed from the
#: encoder itself and interpolated into the oracle SQL, so the oracle
#: pins the exact on-disk layout.
MP4_OVERHEAD = len(synth_mp4_blob(0)) - 4 * synth_mp4_params(0)["n"] - sum(
    synth_mp4_params(0)["sizes"]
)

MP4_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_bytes", LongType()),
        StructField("duration", LongType()),
        StructField("total_ticks", LongType()),
        StructField("mdat_sum", LongType()),
    ]
)


def as_mp4_media_table(docs: DataFrame) -> DataFrame:
    """Real-MP4 corpus: one genuine ISO-BMFF file per document.  Narrow
    ``mapInPandas`` (no shuffle); at 100 TB the blobs would arrive in
    parquet binary columns and this stage disappears."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": ["video/mp4"] * len(pdf),
                    "media": [synth_mp4_blob(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(_synth, schema=REAL_MEDIA_SCHEMA)


def extract_mp4_features(media: DataFrame) -> DataFrame:
    """REAL container demux over the binary column: every blob goes
    through ``decode_mp4`` (box walk, stsz-vs-mdat cross-check, sample
    slicing); nothing here reads the synthesis parameters."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in MP4_FEATURE_SCHEMA}
            for doc_id, mt, blob in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media"]
            ):
                b = bytes(blob)
                d = decode_media(b, mt)
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                out["n_bytes"].append(len(b))
                out["n_samples"].append(len(d["sample_sizes"]))
                out["sample_bytes"].append(sum(d["sample_sizes"]))
                out["duration"].append(d["duration"])
                out["total_ticks"].append(d["total_ticks"])
                out["mdat_sum"].append(sum(d["mdat"]))
            yield pd.DataFrame(out).astype(
                {f.name: "int64" for f in MP4_FEATURE_SCHEMA if f.name != "media_type"}
            )

    return media.mapInPandas(_extract, schema=MP4_FEATURE_SCHEMA)


def mp4_media_rollup(docs: DataFrame) -> DataFrame:
    """Whole-corpus MP4 round-trip: encode (real box tree) → container
    demux (box walk, timing, sample table, mdat cross-check) → rollup.
    The oracle recomputes every total — including the exact file byte
    size via ``MP4_OVERHEAD`` — in closed form, so a container bug
    anywhere (box sizing, stco offset math, stsz table, mdat slicing)
    breaks the hash match."""
    feats = extract_mp4_features(as_mp4_media_table(docs))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("n_samples").alias("total_samples"),
        F.sum("sample_bytes").alias("total_sample_bytes"),
        F.sum("duration").alias("total_duration"),
        F.sum("total_ticks").alias("ticks_total"),
        F.sum("mdat_sum").alias("mdat_value_total"),
    )


def media_rollup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-media-type rollup of the extracted features."""
    feats = extract_media_features(as_media_table(docs, text_col))
    # fake_feature is a double; sum via decimal so the aggregate is exact
    # and order-independent (double sums are neither).
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("content_md5").alias("n_unique"),
        F.sum(F.col("fake_feature").cast("decimal(20,6)"))
        .cast("decimal(38,6)")
        .cast("string")
        .alias("feature_sum"),
    )


# ---------------------------------------------------------------------------
# Real transforms over decoded media: resize (box filter) + frame sampling
# ---------------------------------------------------------------------------

THUMB_FACTOR = 2
AUDIO_CLIP_LEN = 32
FRAME_SAMPLES = 3


def downsample_image(pixels, w: int, h: int, f: int) -> tuple:
    """Box-filter downsample by integer factor ``f``: each output pixel
    is the FLOOR of the mean over its f×f input block (edge blocks that
    don't divide evenly are dropped — the standard crop-to-multiple
    convention).  Integer math end to end, so exact in any engine."""
    tw, th = w // f, h // f
    out = []
    for ty in range(th):
        for tx in range(tw):
            acc = [0, 0, 0]
            for dy in range(f):
                for dx in range(f):
                    p = pixels[(ty * f + dy) * w + (tx * f + dx)]
                    acc = [a + v for a, v in zip(acc, p)]
            out.append(tuple(a // (f * f) for a in acc))
    return tw, th, out


MEDIA_TRANSFORM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("n_units", LongType()),
        StructField("value_sum", LongType()),
    ]
)


def media_thumbnails(
    docs: DataFrame, factor: int = THUMB_FACTOR, clip_len: int = AUDIO_CLIP_LEN
) -> DataFrame:
    """REAL resize/clip over the real-codec corpus: decode every blob
    with the stdlib codec, then box-downsample images by ``factor``
    (audio rows are clipped to their first ``clip_len`` samples — the
    audio analog of a thumbnail).  Narrow ``mapInPandas``; one row per
    media item: doc_id, media_type, out_w, out_h, n_units, value_sum
    (sum over all channels of the TRANSFORMED output — floor-mean
    averaging means a resize bug shifts the sum)."""

    def _thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                f.name: [] for f in MEDIA_TRANSFORM_SCHEMA
            }
            for doc_id, mt, blob in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media"]
            ):
                d = decode_media(bytes(blob), mt)
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                if d["kind"] == "audio":
                    clip = d["samples"][:clip_len]
                    out["out_w"].append(len(clip))
                    out["out_h"].append(1)
                    out["n_units"].append(len(clip))
                    out["value_sum"].append(sum(clip))
                else:
                    tw, th, px = downsample_image(
                        d["pixels"], d["width"], d["height"], factor
                    )
                    out["out_w"].append(tw)
                    out["out_h"].append(th)
                    out["n_units"].append(tw * th)
                    out["value_sum"].append(sum(sum(p) for p in px))
            yield pd.DataFrame(out).astype(
                {
                    f.name: "int64"
                    for f in MEDIA_TRANSFORM_SCHEMA
                    if f.name != "media_type"
                }
            )

    return as_real_media_table(docs).mapInPandas(
        _thumb, schema=MEDIA_TRANSFORM_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("sample_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_sum", LongType()),
    ]
)


def media_frame_samples(
    docs: DataFrame, n_frames: int = FRAME_SAMPLES
) -> DataFrame:
    """REAL frame sampling over the MP4 corpus: container-demux every
    blob, pick ``n_frames`` evenly spaced samples (index ``j*n //
    n_frames``), and emit each actual payload slice's length and byte
    sum — a 1→N ``mapInPandas`` UDTF over real demuxed data, replacing
    the md5 stand-in frames of the fake-path exemplar."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in FRAME_SAMPLE_SCHEMA}
            for doc_id, mt, blob in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media"]
            ):
                d = decode_media(bytes(blob), mt)
                n = len(d["samples"])
                for j in range(n_frames):
                    idx = j * n // n_frames
                    frame = d["samples"][idx]
                    out["doc_id"].append(int(doc_id))
                    out["frame_no"].append(j)
                    out["sample_idx"].append(idx)
                    out["frame_bytes"].append(len(frame))
                    out["frame_sum"].append(sum(frame))
            yield pd.DataFrame(out).astype(
                {f.name: "int64" for f in FRAME_SAMPLE_SCHEMA}
            )

    return as_mp4_media_table(docs).mapInPandas(
        _frames, schema=FRAME_SAMPLE_SCHEMA
    )
