"""Unit tests for the stdlib media codecs (L12 real-decode path).

The registered query's synthetic corpus uses flat-per-channel images
(so the DuckDB oracle has closed-form sums); these tests carry the
order-sensitivity that flatness can't: exact pixel/sample round-trips
with VARIED data pin BMP bottom-up row order, BGR channel order, row
padding, PPM header tokenization, PCM16 signedness, and RIFF chunk
walking.
"""

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from evmtrace_etl_spark.operators import multimodal as mm

rng = random.Random(0xC0DEC)


def _rand_pixels(w, h):
    return [
        (rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255))
        for _ in range(w * h)
    ]


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (4, 4), (5, 7), (16, 9)])
def test_bmp_round_trip_exact(w, h):
    px = _rand_pixels(w, h)
    d = mm.decode_bmp(mm.encode_bmp(w, h, px))
    assert (d["width"], d["height"]) == (w, h)
    assert d["pixels"] == px  # exact: catches row order, BGR, padding


def test_bmp_padding_is_excluded():
    # w=1 -> 3 data bytes + 1 pad byte per row; poison the pad bytes
    px = _rand_pixels(1, 4)
    blob = bytearray(mm.encode_bmp(1, 4, px))
    stride = 4
    for row in range(4):
        blob[54 + row * stride + 3] = 0xFF
    assert mm.decode_bmp(bytes(blob))["pixels"] == px


def test_bmp_top_down_negative_height():
    # height < 0 means top-down row order per the BMP spec
    px = _rand_pixels(3, 2)
    blob = bytearray(mm.encode_bmp(3, 2, px))
    (h,) = struct.unpack_from("<i", blob, 22)
    struct.pack_into("<i", blob, 22, -h)
    # rows in the file are bottom-up; reinterpreting as top-down
    # flips the row order
    got = mm.decode_bmp(bytes(blob))["pixels"]
    assert got == px[3:6] + px[0:3]


@pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (10, 2)])
def test_ppm_round_trip_exact(w, h):
    px = _rand_pixels(w, h)
    d = mm.decode_ppm(mm.encode_ppm(w, h, px))
    assert (d["width"], d["height"]) == (w, h)
    assert d["pixels"] == px


def test_ppm_header_comments_and_whitespace():
    px = _rand_pixels(4, 3)
    raster = bytes(v for p in px for v in p)
    blob = b"P6 # trailing comment\n  4\t3 # dims\n255\n" + raster
    d = mm.decode_ppm(blob)
    assert (d["width"], d["height"]) == (4, 3)
    assert d["pixels"] == px


def test_wav_round_trip_exact_signed():
    s = [rng.randint(-32768, 32767) for _ in range(137)] + [-32768, 32767, 0]
    d = mm.decode_wav(mm.encode_wav(s, 44100))
    assert d["samples"] == s
    assert d["sample_rate"] == 44100
    assert (d["n_channels"], d["bits"]) == (1, 16)


def test_wav_chunk_walking_and_odd_padding():
    # insert an unknown odd-sized chunk (needs a pad byte) before fmt
    s = [rng.randint(-100, 100) for _ in range(9)]
    blob = mm.encode_wav(s)
    extra = struct.pack("<4sI", b"junk", 3) + b"xyz" + b"\x00"
    hacked = bytearray(blob[:12] + extra + blob[12:])
    struct.pack_into("<I", hacked, 4, len(hacked) - 8)
    assert mm.decode_wav(bytes(hacked))["samples"] == s


def test_wav_rejects_non_pcm16():
    blob = bytearray(mm.encode_wav([1, 2, 3]))
    struct.pack_into("<H", blob, 20, 3)  # IEEE float format tag
    with pytest.raises(ValueError):
        mm.decode_wav(bytes(blob))


def test_decode_media_dispatch_and_stub():
    mt, blob = mm.synth_media_blob(0)
    assert mm.decode_media(blob, mt)["kind"] == "image"
    px = _rand_pixels(2, 2)
    assert (
        mm.decode_media(mm.encode_png(2, 2, px), "image/png")["pixels"]
        == px
    )
    assert (
        mm.decode_media(mm.synth_mp4_blob(3), "video/mp4")["kind"]
        == "video"
    )
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"GIF89a", "image/gif")


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
def test_bmp_ppm_round_trip_property(w, h, data):
    px = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
            ),
            min_size=w * h,
            max_size=w * h,
        )
    )
    assert mm.decode_bmp(mm.encode_bmp(w, h, px))["pixels"] == px
    assert mm.decode_ppm(mm.encode_ppm(w, h, px))["pixels"] == px


@settings(max_examples=40, deadline=None, derandomize=True)
@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=300))
def test_wav_round_trip_property(samples):
    assert mm.decode_wav(mm.encode_wav(samples))["samples"] == samples


def test_synth_blobs_match_oracle_closed_forms():
    """The oracle SQL recomputes sizes and sums in closed form; verify
    the Python synthesis + REAL decode agree for a doc_id sweep."""
    for doc_id in range(0, 500, 3):
        p = mm.synth_media_params(doc_id)
        mt, blob = mm.synth_media_blob(doc_id)
        d = mm.decode_media(blob, mt)
        if p["kind"] == 1:
            n, base = p["n"], p["base"]
            assert len(blob) == 44 + 2 * n
            assert len(d["samples"]) == n
            assert (
                sum(d["samples"])
                == n * base + (n // 97) * 4656 + (n % 97) * ((n % 97) - 1) // 2
            )
        else:
            w, h = p["w"], p["h"]
            exp = (
                54 + h * ((3 * w + 3) // 4 * 4)
                if p["kind"] == 0
                else 9 + len(str(w)) + len(str(h)) + 3 * w * h
            )
            assert len(blob) == exp
            assert sum(px[0] for px in d["pixels"]) == w * h * p["pr"]
            assert sum(px[1] for px in d["pixels"]) == w * h * p["pg"]
            assert sum(px[2] for px in d["pixels"]) == w * h * p["pb"]


# ---------------------------------------------------------------------------
# PNG (stdlib zlib codec)
# ---------------------------------------------------------------------------

def _png_with_filters(w, h, pixels, ftypes):
    """Build a PNG whose scanlines use the given per-row filter types —
    exercises decode paths encode_png (filter 0 only) never emits."""
    import zlib

    bpp, stride = 3, 3 * w
    flat = bytearray()
    for y in range(h):
        for x in range(w):
            flat += bytes(pixels[y * w + x])
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        line = bytearray(flat[y * stride : (y + 1) * stride])
        ft = ftypes[y % len(ftypes)]
        out = bytearray(stride)
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                out[i] = line[i]
            elif ft == 1:
                out[i] = (line[i] - a) & 0xFF
            elif ft == 2:
                out[i] = (line[i] - b) & 0xFF
            elif ft == 3:
                out[i] = (line[i] - (a + b) // 2) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (line[i] - pr) & 0xFF
        raw.append(ft)
        raw += out
        prev = line

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    comp = zlib.compress(bytes(raw))
    # split IDAT in two to exercise multi-IDAT concatenation
    mid = len(comp) // 2
    return (
        mm._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp[:mid])
        + chunk(b"IDAT", comp[mid:])
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("w,h", [(1, 1), (3, 4), (7, 5), (16, 9)])
def test_png_round_trip_exact(w, h):
    px = _rand_pixels(w, h)
    d = mm.decode_png(mm.encode_png(w, h, px))
    assert (d["width"], d["height"]) == (w, h)
    assert d["pixels"] == px


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filter_types_reconstruct(ftypes):
    px = _rand_pixels(5, 6)
    blob = _png_with_filters(5, 6, px, ftypes)
    assert mm.decode_png(blob)["pixels"] == px


def test_png_rejects_bad_crc():
    blob = bytearray(mm.encode_png(2, 2, _rand_pixels(2, 2)))
    blob[20] ^= 0xFF  # corrupt IHDR payload without fixing its CRC
    with pytest.raises(ValueError):
        mm.decode_png(bytes(blob))


def test_png_rejects_unsupported_profile():
    import zlib

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)  # RGBA
    blob = mm._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        mm.decode_png(blob)


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=8),
    data=st.data(),
)
def test_png_round_trip_property(w, h, data):
    px = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
            ),
            min_size=w * h,
            max_size=w * h,
        )
    )
    assert mm.decode_png(mm.encode_png(w, h, px))["pixels"] == px


# ---------------------------------------------------------------------------
# MP4 (stdlib ISO-BMFF container demux)
# ---------------------------------------------------------------------------

def test_mp4_round_trip_exact():
    sizes = [11, 3, 7, 19, 1]
    blob = mm.encode_mp4(1800, sizes, fill=42, sample_delta=125)
    d = mm.decode_mp4(blob)
    assert d["kind"] == "video"
    assert d["timescale"] == 600 and d["duration"] == 1800
    assert d["media_timescale"] == 600
    assert d["media_duration"] == 5 * 125
    assert d["total_ticks"] == 5 * 125
    assert d["sample_sizes"] == sizes
    assert d["samples"] == [bytes([42]) * s for s in sizes]


def test_mp4_skips_unknown_boxes_and_largesize():
    """A conforming demuxer must skip boxes it doesn't know and accept
    the 64-bit largesize form — paths encode_mp4 never emits."""
    base = mm.encode_mp4(600, [4, 6], fill=7)
    i = base.find(b"mdat") - 4
    (sz,) = struct.unpack_from(">I", base, i)
    payload = base[i + 8 : i + sz]
    with_free = base[:i] + mm._mp4_box(b"free", b"x" * 9) + base[i:]
    big_mdat = (
        base[:i]
        + struct.pack(">I", 1)
        + b"mdat"
        + struct.pack(">Q", 16 + len(payload))
        + payload
    )
    for blob in (with_free, big_mdat):
        d = mm.decode_mp4(blob)
        assert d["sample_sizes"] == [4, 6]
        assert d["mdat"] == payload


def test_mp4_uniform_stsz_form():
    """stsz's sample_size != 0 form carries no per-sample table."""
    blob = mm.encode_mp4(600, [5, 5, 5], fill=9)
    i = blob.find(b"stsz") - 4
    (sz,) = struct.unpack_from(">I", blob, i)
    uniform = mm._mp4_full(b"stsz", 0, 0, struct.pack(">II", 5, 3))
    # splice: shrink stsz, fix every ancestor box size (moov/trak/mdia/
    # minf/stbl) and drop the now-stale stco offset check via re-walk
    delta = sz - len(uniform)
    out = bytearray(blob[:i] + uniform + blob[i + sz :])
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = out.find(tag) - 4
        (old,) = struct.unpack_from(">I", out, j)
        struct.pack_into(">I", out, j, old - delta)
    d = mm.decode_mp4(bytes(out))
    assert d["sample_sizes"] == [5, 5, 5]


def test_mp4_mdat_mismatch_rejected():
    blob = bytearray(mm.encode_mp4(600, [4, 4], fill=1))
    i = bytes(blob).find(b"mdat") - 4
    (sz,) = struct.unpack_from(">I", blob, i)
    struct.pack_into(">I", blob, i, sz - 1)  # truncate one payload byte
    with pytest.raises(ValueError):
        mm.decode_mp4(bytes(blob[: len(blob) - 1]))


def test_mp4_synth_matches_oracle_closed_forms():
    """The oracle recomputes n_bytes/sums in closed form; verify the
    encoder + demux agree for a doc_id sweep (the MP4_OVERHEAD layout
    constant is part of the contract)."""
    for doc_id in range(0, 400, 7):
        p = mm.synth_mp4_params(doc_id)
        n, sbase = p["n"], 10 + doc_id % 29
        blob = mm.synth_mp4_blob(doc_id)
        d = mm.decode_mp4(blob)
        sizes_sum = n * sbase + (n // 13) * 78 + (n % 13) * ((n % 13) - 1) // 2
        assert sum(d["sample_sizes"]) == sizes_sum
        assert len(blob) == mm.MP4_OVERHEAD + 4 * n + sizes_sum
        assert d["duration"] == 600 * (1 + doc_id % 7)
        assert d["total_ticks"] == 100 * n
        assert sum(d["mdat"]) == sizes_sum * p["fill"]


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    duration=st.integers(1, 10**6),
    sizes=st.lists(st.integers(0, 200), min_size=1, max_size=60),
    fill=st.integers(0, 255),
    delta=st.integers(1, 3000),
)
def test_mp4_round_trip_property(duration, sizes, fill, delta):
    d = mm.decode_mp4(mm.encode_mp4(duration, sizes, fill, sample_delta=delta))
    assert d["duration"] == duration
    assert d["sample_sizes"] == sizes
    assert d["total_ticks"] == len(sizes) * delta
    assert d["samples"] == [bytes([fill]) * s for s in sizes]


# ---------------------------------------------------------------------------
# Real transforms: box-filter resize + MP4 frame sampling
# ---------------------------------------------------------------------------

def test_downsample_box_filter_exact():
    """Floor-mean over 2x2 blocks on varied pixels, checked against a
    direct per-block computation (crop-to-multiple convention)."""
    w, h = 5, 4  # odd width: last column cropped
    px = _rand_pixels(w, h)
    tw, th, out = mm.downsample_image(px, w, h, 2)
    assert (tw, th) == (2, 2)
    for ty in range(th):
        for tx in range(tw):
            block = [
                px[(ty * 2 + dy) * w + (tx * 2 + dx)]
                for dy in range(2)
                for dx in range(2)
            ]
            want = tuple(sum(c[i] for c in block) // 4 for i in range(3))
            assert out[ty * tw + tx] == want


def test_downsample_flat_is_identity_value():
    px = [(7, 9, 11)] * (6 * 4)
    tw, th, out = mm.downsample_image(px, 6, 4, 2)
    assert (tw, th) == (3, 2)
    assert all(p == (7, 9, 11) for p in out)


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    w=st.integers(2, 12),
    h=st.integers(2, 10),
    f=st.integers(2, 3),
    data=st.data(),
)
def test_downsample_property_matches_naive(w, h, f, data):
    px = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
            ),
            min_size=w * h,
            max_size=w * h,
        )
    )
    tw, th, out = mm.downsample_image(px, w, h, f)
    assert (tw, th) == (w // f, h // f)
    for ty in range(th):
        for tx in range(tw):
            acc = [0, 0, 0]
            for dy in range(f):
                for dx in range(f):
                    p = px[(ty * f + dy) * w + (tx * f + dx)]
                    acc = [a + v for a, v in zip(acc, p)]
            assert out[ty * tw + tx] == tuple(a // (f * f) for a in acc)


def test_mp4_frame_indices_slice_real_payload():
    """The evenly-spaced frame indices must address the DEMUXED sample
    slices, not recomputed offsets."""
    for doc_id in (0, 5, 13, 100):
        blob = mm.synth_mp4_blob(doc_id)
        d = mm.decode_mp4(blob)
        n = len(d["samples"])
        p = mm.synth_mp4_params(doc_id)
        for j in range(3):
            idx = j * n // 3
            frame = d["samples"][idx]
            assert len(frame) == p["sizes"][idx]
            assert sum(frame) == p["sizes"][idx] * p["fill"]


def test_mp4_multiple_mdat_boxes_concatenate():
    """Progressive files may split samples across several mdat boxes;
    payloads accumulate in file order."""
    base = mm.encode_mp4(600, [4, 6], fill=7)
    i = base.find(b"mdat") - 4
    (sz,) = struct.unpack_from(">I", base, i)
    payload = base[i + 8 : i + sz]
    split = (
        base[:i]
        + mm._mp4_box(b"mdat", payload[:4])
        + mm._mp4_box(b"mdat", payload[4:])
    )
    d = mm.decode_mp4(split)
    assert d["mdat"] == payload
    assert d["samples"] == [payload[:4], payload[4:]]


def test_mp4_missing_stts_rejected_cleanly():
    blob = mm.encode_mp4(600, [3], fill=1)
    i = blob.find(b"stts") - 4
    (sz,) = struct.unpack_from(">I", blob, i)
    out = bytearray(blob[:i] + mm._mp4_box(b"free", b"\x00" * (sz - 8)) + blob[i + sz :])
    with pytest.raises(ValueError, match="stts"):
        mm.decode_mp4(bytes(out))
