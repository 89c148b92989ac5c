"""Unit tests for the pure-Python PNG/WAV codecs (no Spark needed)."""

import struct
import zlib

import numpy as np
import pytest

from codd_spark.functions.imaging import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    png_info,
    resize_nearest,
)


def test_png_roundtrip_all_filters_and_channels():
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        for ft in range(5):
            arr = rng.integers(0, 256, size=(13, 17, ch), dtype=np.uint8)
            data = encode_png(arr, filter_type=ft)
            w, h, depth, _color, nch = png_info(data)
            assert (w, h, depth, nch) == (17, 13, 8, ch)
            assert np.array_equal(decode_png(data), arr), (ch, ft)


def test_png_chunk_crcs_valid():
    data = encode_png(np.arange(75, dtype=np.uint8).reshape(5, 5, 3), filter_type=4)
    pos = 8
    seen = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(ctype + body), ctype
        seen.append(ctype)
        pos += 12 + length
    assert seen == [b"IHDR", b"IDAT", b"IEND"]


def test_png_rejects_garbage():
    with pytest.raises(ValueError, match="not a PNG"):
        png_info(b"\x00" * 64)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF not png")


def test_resize_nearest_dims_and_solid_color():
    arr = np.full((20, 30, 3), 99, dtype=np.uint8)
    out = resize_nearest(arr, 7, 11)
    assert out.shape == (11, 7, 3)
    assert (out == 99).all()


def test_wav_roundtrip_exact():
    s = (np.sin(np.linspace(0, 100, 8000)) * 12000).astype(np.int16)
    meta = decode_wav(encode_wav(s, 16000))
    assert meta["n_samples"] == 8000
    assert meta["sample_rate"] == 16000
    assert abs(meta["duration_sec"] - 0.5) < 1e-12
    want_rms = float(np.sqrt(np.mean(s.astype(np.float64) ** 2)))
    assert abs(meta["rms"] - want_rms) < 1e-9


def test_png_roundtrip_property():
    """Hypothesis: any uint8 image, any channel count, any filter type
    round-trips exactly through the codec."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import hypothesis.extra.numpy as hnp

    @settings(max_examples=40, deadline=None)
    @given(
        arr=hnp.arrays(
            dtype=np.uint8,
            shape=st.tuples(
                st.integers(1, 24), st.integers(1, 24), st.sampled_from([1, 2, 3, 4])
            ),
        ),
        ft=st.integers(0, 4),
    )
    def check(arr, ft):
        assert np.array_equal(decode_png(encode_png(arr, filter_type=ft)), arr)

    check()


def test_apng_roundtrip_all_filters():
    """APNG encode -> frame-walk decode round-trips exactly for every
    scanline filter and 1/3-channel frames."""
    from codd_spark.functions.imaging import apng_frames, apng_info, encode_apng

    rng = np.random.RandomState(11)
    for ch in (1, 3):
        shape = (9, 13) if ch == 1 else (9, 13, ch)
        frames = [rng.randint(0, 256, shape, dtype=np.uint8) for _ in range(4)]
        for ft in range(5):
            data = encode_apng(frames, filter_type=ft)
            assert apng_info(data) == (13, 9, ch, 4)
            back = apng_frames(data)
            assert len(back) == 4
            for a, b in zip(frames, back):
                a3 = a[:, :, None] if a.ndim == 2 else a
                assert np.array_equal(a3, b)


def test_apng_offset_composite_and_errors():
    """Sub-canvas frames composite at their fcTL offset onto the running
    canvas; truncated/garbage inputs are rejected loudly."""
    import struct
    import zlib

    import pytest

    from codd_spark.functions import imaging as im

    base = np.zeros((8, 8), dtype=np.uint8)
    data = im.encode_apng([base, base])
    # hand-patch frame 2 into a 2x2 region at (3, 4): rebuild the fdAT
    out, seq = [data[:8]], 0
    for ctype, body in im._chunks(data):
        if ctype == b"fcTL":
            (s,) = struct.unpack(">I", body[:4])
            if s > 0:  # second frame: shrink to 2x2 at offset (3,4)
                body = struct.pack(">IIIIIHHBB", s, 2, 2, 3, 4, 1, 10, 0, 0)
        if ctype == b"fdAT":
            patch = np.full((2, 2), 255, dtype=np.uint8)
            body = body[:4] + zlib.compress(im._filter_scanlines(patch[:, :, None], 0))
        out.append(im._chunk(ctype, body))
    patched = b"".join(out)
    frames = im.apng_frames(patched)
    assert frames[0].sum() == 0
    f2 = frames[1][:, :, 0]
    assert f2[4:6, 3:5].min() == 255 and f2.sum() == 4 * 255

    with pytest.raises(ValueError, match="not a PNG"):
        im.apng_frames(b"junk")
    with pytest.raises(ValueError, match="acTL"):
        im.apng_frames(im.encode_png(base))  # plain PNG is not an APNG


def _jpeg_bytes(w, h, ncomp, sof=0xC0):
    """Minimal structurally-valid JPEG header stream: SOI, APP0, a DHT
    (must be SKIPPED by the scanner despite its 0xC4 code), the SOF, a
    bogus SOS, EOI. Not decodable — jpeg_info only reads markers."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    dht = b"\xff\xc4" + (19).to_bytes(2, "big") + bytes(17)
    sof_body = (
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([ncomp])
        + bytes(3 * ncomp)
    )
    sof_seg = bytes([0xFF, sof]) + (2 + len(sof_body)).to_bytes(2, "big") + sof_body
    sos = b"\xff\xda" + (8).to_bytes(2, "big") + bytes(6)
    return b"\xff\xd8" + app0 + dht + sof_seg + sos + b"\x00\xff\x00" + b"\xff\xd9"


def test_jpeg_info_baseline_and_progressive():
    from codd_spark.functions.imaging import jpeg_info

    assert jpeg_info(_jpeg_bytes(640, 480, 3)) == (640, 480, 3)
    assert jpeg_info(_jpeg_bytes(31, 17, 1, sof=0xC2)) == (31, 17, 1)  # progressive
    assert jpeg_info(_jpeg_bytes(100, 50, 4)) == (100, 50, 4)  # CMYK


def test_jpeg_info_rejects_non_jpeg_and_truncated():
    import pytest as _pytest

    from codd_spark.functions.imaging import jpeg_info

    with _pytest.raises(ValueError, match="SOI"):
        jpeg_info(b"\x89PNG\r\n\x1a\n")
    with _pytest.raises(ValueError, match="SOF"):
        jpeg_info(b"\xff\xd8\xff\xd9")  # SOI + EOI, no frame


def test_jpeg_info_rejects_mid_sof_truncation():
    """ADVICE r5: a JPEG cut mid-SOF-header must raise, not IndexError or
    silently parse garbage dimensions from the short slice."""
    import pytest as _pytest

    from codd_spark.functions.imaging import jpeg_info

    full = _jpeg_bytes(640, 480, 3)
    sof_at = full.index(b"\xff\xc0")
    # cut inside the SOF payload, before the n_components byte
    for cut in (sof_at + 4, sof_at + 6, sof_at + 8, sof_at + 9):
        with _pytest.raises(ValueError, match="truncated|SOF"):
            jpeg_info(full[:cut])
    # a SOF whose declared seglen is too short for the payload
    bad = bytearray(full)
    bad[sof_at + 2 : sof_at + 4] = (5).to_bytes(2, "big")
    with _pytest.raises(ValueError, match="truncated"):
        jpeg_info(bytes(bad))


def test_codec_dispatch_routes_jpeg_header_pure():
    """image_info must answer JPEG dims via the pure SOF scan — no PIL
    needed (and identical to PIL's bands when PIL exists)."""
    from codd_spark.functions.codecs import image_info

    assert image_info(_jpeg_bytes(320, 200, 3)) == (320, 200, 3)


def test_dhash_closed_form_roundtrip():
    """dhash64(decode(gradient PNG)) must equal the target hash the
    gradient encodes — the exactness the image_near_dups oracle rests
    on — for ids exercising every PNG scanline filter and both XOR
    branches of H(id)."""
    import numpy as np

    from codd_spark.functions.imaging import decode_png, dhash64, encode_png

    def H(i):
        h = ((i % 50 + 1) * 0x9E3779B97F4A7C15) % (1 << 64)
        if i >= 50:
            h ^= 1 << ((i // 50) % 64)
        return h

    def signed(h):
        return h - (1 << 64) if h >= (1 << 63) else h

    for i in (0, 1, 2, 3, 4, 49, 50, 123, 250, 299):
        h = H(i)
        arr = np.empty((8, 9), dtype=np.uint8)
        for r in range(8):
            arr[r, 0] = 128
            for c in range(8):
                arr[r, c + 1] = arr[r, c] + (1 if (h >> (r * 8 + c)) & 1 else -1)
        assert dhash64(decode_png(encode_png(arr, filter_type=i % 5))) == signed(h)


def test_phash_perceptual_invariance():
    """The property that makes pHash a dedup signal: identical content at
    a different scale hashes identically (nearest upscale is exactly
    scale-invariant under the area resize), while unrelated content is
    ~32 bits away. Also pins brightness-shift invariance for dHash
    (gradients don't move under +k)."""
    import numpy as np

    from codd_spark.functions.imaging import (
        dhash64,
        phash64,
        resize_nearest,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    up = resize_nearest(img, 128, 128)
    other = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(phash64(img), phash64(up)) <= 4
    assert ham(phash64(img), phash64(other)) > 16
    shifted = np.clip(img.astype(int) + 10, 0, 255).astype(np.uint8)
    assert ham(dhash64(img), dhash64(shifted)) <= 2
