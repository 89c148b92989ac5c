"""Pure-Python baseline JPEG codec (functions/jpeg.py): exact flat
round trips under all-ones quantization, +-1 on arbitrary content (the
float-IDCT bound), chroma subsampling, restart markers, lossy tables,
and integration with the codec dispatcher + perceptual hashing."""

import numpy as np
import pytest

from codd_spark.functions.jpeg import decode_jpeg, encode_jpeg


def test_flat_grayscale_roundtrips_exactly():
    """Flat image -> DC-only blocks -> integral DC -> /1 quant: the
    LOSSY container is exact here, which is what makes the closed-form
    jpeg_metadata oracle possible."""
    for v, w, h in [(0, 8, 8), (128, 16, 8), (255, 24, 17), (77, 13, 9)]:
        out = decode_jpeg(encode_jpeg(np.full((h, w), v, dtype=np.uint8)))
        assert out.shape == (h, w, 1)
        assert (out[:, :, 0] == v).all()


def test_arbitrary_grayscale_within_one():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))[:, :, 0]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_color_444_and_420_flat_within_two():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:] = (200, 30, 99)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(img, subsampling=sub))
        assert out.shape == (16, 16, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_restart_markers_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 64), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, restart_interval=3))[:, :, 0]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_lossy_quant_decodes_and_degrades_gracefully():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    q = np.full(64, 16, dtype=np.int32)
    q[0] = 8
    out = decode_jpeg(encode_jpeg(img, quant=q))[:, :, 0]
    # lossy but sane: bounded by ~half the largest quant step x IDCT gain
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 64


def test_jpeg_info_matches_encoder():
    from codd_spark.functions.imaging import jpeg_info

    b = encode_jpeg(np.zeros((17, 23, 3), dtype=np.uint8))
    assert jpeg_info(b) == (23, 17, 3)


def test_rejections():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # SOF2 itself now decodes (r10), but a MALFORMED progressive stream
    # — a baseline-style full-band interleaved scan under a progressive
    # frame header — must be rejected, not misdecoded
    b = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(ValueError, match="invalid progressive scan"):
        decode_jpeg(bytes(b))
    # arithmetic coding stays rejected with guidance
    b2 = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = b2.find(b"\xff\xc0")
    b2[i + 1] = 0xC9  # SOF9: extended sequential, arithmetic
    with pytest.raises(ValueError, match="SOF9"):
        decode_jpeg(bytes(b2))


def test_codec_dispatcher_routes_jpeg(spark):
    """decode_image on JPEG bytes takes the pure baseline decoder when
    PIL is absent, and downstream operators (metadata, perceptual hash)
    run unchanged over JPEG payloads."""
    from codd_spark.functions import codecs
    from codd_spark.operators.multimodal import (
        decode_image_features,
        image_phash,
        jpeg_media_from_ids,
    )

    img = np.full((10, 12), 77, dtype=np.uint8)
    arr = codecs.decode_image(encode_jpeg(img))
    assert arr.shape == (10, 12, 1) and (arr[:, :, 0] == 77).all()

    ids = spark.range(0, 40).selectExpr("id AS media_id")
    media = jpeg_media_from_ids(ids)
    feats = {r.media_id: r for r in decode_image_features(media, decode="real").collect()}
    for i in range(40):
        r = feats[i]
        assert (r.width, r.height) == (16 + i % 32, 16 + i % 17)
        assert r.mean_pixel == float((i * 7) % 256)
    # perceptual hash over JPEG payloads: flat images hash to dhash 0
    sigs = {r.media_id: r.sig for r in image_phash(media, method="dhash").collect()}
    assert set(sigs.values()) == {0}


def test_fill_bytes_and_standalone_markers_in_header():
    """ADVICE r9: T.81 B.1.1.2 permits any number of 0xFF fill bytes
    before a marker code, and standalone markers (TEM 0x01, RSTn) carry
    no length segment. Conformant encoders emit both; the header walk
    must skip them instead of raising 'marker expected'."""
    img = (np.arange(16 * 16, dtype=np.uint8).reshape(16, 16) * 3) % 256
    clean = encode_jpeg(img)
    want = decode_jpeg(clean)
    # splice fill padding + TEM + RST0 right after SOI
    padded = clean[:2] + b"\xff\xff\xff" + b"\xff\x01" + b"\xff\xd0" + clean[2:]
    got = decode_jpeg(bytes(padded))
    assert np.array_equal(got, want)


def test_progressive_decodes_identically_to_baseline():
    """r10 (VERDICT r9 item 4): the progressive writer emits the same
    quantized coefficients as the baseline writer under a libjpeg-shaped
    scan script (interleaved DC at Al=1, DC refinement, two spectral AC
    bands at Al=1, AC refinement over 1-63), so decode(progressive)
    must equal decode(baseline) PIXEL FOR PIXEL — exercising spectral
    selection, successive approximation, DC/AC refinement, EOB runs,
    ZRL-in-refinement, and the true-vs-padded 4:2:0 block grids."""
    rng = np.random.RandomState(7)
    q4 = np.ones(64, dtype=np.int32)
    q4[1:] = 4
    cases = [
        (np.full((16, 16), 77, dtype=np.uint8), {}),
        ((np.arange(24 * 17, dtype=np.uint8).reshape(24, 17) * 3) % 256, {}),
        (rng.randint(0, 256, (33, 29), dtype=np.uint8), {}),
        (rng.randint(0, 256, (19, 21, 3), dtype=np.uint8), {}),
        # w=24 420: Y true grid (3 blocks) != padded grid (4 blocks)
        (rng.randint(0, 256, (24, 24, 3), dtype=np.uint8),
         {"subsampling": "420"}),
        (rng.randint(0, 256, (17, 23, 3), dtype=np.uint8),
         {"subsampling": "420"}),
        (rng.randint(0, 256, (32, 32), dtype=np.uint8), {"quant": q4}),
        (rng.randint(0, 256, (40, 40), dtype=np.uint8),
         {"restart_interval": 3}),
    ]
    for img, kw in cases:
        base = decode_jpeg(encode_jpeg(img, **kw))
        prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
        assert np.array_equal(base, prog), kw


def test_progressive_flat_roundtrips_exactly():
    """Closed form: flat blocks are DC-only; the Al=1 first scan plus
    the refinement restore the exact integral DC, so flat progressive
    output round-trips exactly (the jpeg_metadata oracle property)."""
    for v in (0, 1, 77, 128, 254, 255):
        img = np.full((24, 17), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, progressive=True))
        assert (out == v).all()


def test_progressive_header_info_and_codec_routing(spark):
    """jpeg_info reads SOF2 dims without decoding; the codec dispatcher
    decodes progressive payloads through the pure path (no PIL)."""
    from codd_spark.functions import codecs
    from codd_spark.functions.imaging import jpeg_info

    img = (np.arange(16 * 16, dtype=np.uint8).reshape(16, 16) * 5) % 256
    b = encode_jpeg(img, progressive=True)
    assert jpeg_info(b) == (16, 16, 1)
    assert np.array_equal(codecs.decode_image(b)[:, :, 0], decode_jpeg(b)[:, :, 0])
