"""Codec-matrix tests for the multimodal dispatch layer
(functions/codecs.py): the pure-Python backends must be active and
correct everywhere; when a native backend (PIL / ffmpeg) is present the
SAME kernel slot upgrades to it with identical schemas and — for
lossless formats — identical pixels. Native branches run only in
codec-capable environments and are skipped (not faked) elsewhere."""

import numpy as np
import pytest

from codd_spark.functions import codecs, imaging

HAS_PIL = codecs.probe()["image"] == "pil"
HAS_FFMPEG = codecs.probe()["video"] == "ffmpeg"


def _png(w=6, h=4, ch=3, seed=7):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    return arr, imaging.encode_png(arr)


def _apng(n_frames=3):
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (4, 5, 3), dtype=np.uint8) for _ in range(n_frames)]
    return frames, imaging.encode_apng(frames)


def test_probe_reports_backends():
    caps = codecs.probe()
    assert set(caps) == {"image", "audio", "video"}
    assert caps["image"] in ("pure", "pil")
    assert caps["audio"] == "pure"
    assert caps["video"] in ("apng", "ffmpeg")


def test_decode_image_matches_pure_decoder():
    arr, png = _png()
    got = codecs.decode_image(png)
    assert got.shape == (4, 6, 3)
    assert np.array_equal(got, arr)
    assert codecs.image_info(png) == (6, 4, 3)


def test_grayscale_normalized_to_hwc():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (4, 6), dtype=np.uint8)
    got = codecs.decode_image(imaging.encode_png(arr))
    assert got.shape == (4, 6, 1)
    assert np.array_equal(got[:, :, 0], arr)


def test_video_frames_apng_everywhere():
    frames, apng = _apng()
    got = codecs.video_frames(apng)
    assert len(got) == len(frames)
    for g, w in zip(got, frames):
        assert np.array_equal(g, w)


def test_non_png_rejected_without_native_codec():
    mp4ish = b"\x00\x00\x00\x20ftypisom" + b"\x00" * 64
    if not HAS_FFMPEG:
        with pytest.raises(ValueError, match="ffmpeg"):
            codecs.video_frames(mp4ish)
    # JPEG headers parse pure-Python now (SOF scan): a truncated/corrupt
    # payload fails with the parser's error even without PIL, and a real
    # SOF header succeeds everywhere.
    jpegish = b"\xff\xd8\xff\xe0" + b"\x00" * 64
    if not HAS_PIL:
        with pytest.raises(ValueError, match="SOF"):
            codecs.image_info(jpegish)


def test_frame_sample_clear_error_on_mp4_without_ffmpeg(spark):
    """Operator-level gate: an mp4 payload reaching frame_sample
    (decode='real') must surface the dispatcher's clear error, not a
    PNG-signature crash."""
    if HAS_FFMPEG:
        pytest.skip("ffmpeg present: mp4 decodes for real here")
    from codd_spark.operators.multimodal import MEDIA_SCHEMA, frame_sample

    mp4ish = b"\x00\x00\x00\x20ftypisom" + b"\x00" * 64
    df = spark.createDataFrame([(1, "video", "mp4", mp4ish)], schema=MEDIA_SCHEMA)
    with pytest.raises(Exception, match="unsupported video container"):
        frame_sample(df, every_n=1, decode="real").collect()


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed")
def test_pil_and_pure_decode_identical():
    """Lossless format, two independent decoders, byte-identical pixels."""
    arr, png = _png(w=9, h=7, ch=3, seed=21)
    via_pil = codecs.decode_image(png)
    via_pure = codecs._ensure_hwc(imaging.decode_png(png))
    assert np.array_equal(via_pil, via_pure)
    assert np.array_equal(via_pil, arr)


@pytest.mark.skipif(not HAS_FFMPEG, reason="ffmpeg not on PATH")
def test_ffmpeg_roundtrip_frame_count():
    """Build an mp4 from PNG frames with ffmpeg, decode it back through
    the dispatcher: frame count survives the container round-trip."""
    import subprocess
    import tempfile

    frames, _ = _apng(n_frames=4)
    with tempfile.TemporaryDirectory() as d:
        for i, fr in enumerate(frames):
            with open(f"{d}/f-{i:03d}.png", "wb") as f:
                f.write(imaging.encode_png(fr))
        subprocess.run(
            ["ffmpeg", "-v", "error", "-framerate", "5", "-i", f"{d}/f-%03d.png",
             "-pix_fmt", "yuv420p", f"{d}/out.mp4"],
            check=True,
        )
        with open(f"{d}/out.mp4", "rb") as f:
            data = f.read()
    assert len(codecs.video_frames(data)) == len(frames)
