"""Codec capability probe + dispatch for the multimodal operators.

The pure-Python PNG/WAV/APNG codecs (functions/imaging.py) are always
available and spec-compliant; when a native codec IS importable (PIL) or
on PATH (ffmpeg), the same kernel slot auto-upgrades to it — per-image
CPU drops ~10-50x and non-PNG containers (JPEG via PIL, mp4/webm via
ffmpeg) become decodable, with no change to the Spark plumbing (schema,
Arrow batching, partitioning). This module is the single swap point the
imaging docstring promises: operators call ``decode_image`` /
``image_info`` / ``video_frames`` and never name a backend.

The probe runs at import time IN THE WORKER (executors import this
module fresh), so a heterogeneous cluster degrades per-host rather than
failing: hosts with PIL use it, hosts without fall back to pure Python.
``probe()`` is also exported for capability reporting/tests.

Decoded pixels are backend-independent: PNG is lossless, so PIL and the
pure decoder produce byte-identical arrays — the codec-matrix test
asserts this whenever both backends are present.
"""

from __future__ import annotations

import importlib.util
import io
import shutil
import subprocess
import tempfile
from typing import Iterator

import numpy as np

from codd_spark.functions import imaging

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def probe() -> dict[str, str]:
    """Active backend per modality: {'image': 'pil'|'pure',
    'audio': 'pure', 'video': 'ffmpeg'|'apng'}."""
    caps = {"image": "pure", "audio": "pure", "video": "apng"}
    if importlib.util.find_spec("PIL") is not None:
        caps["image"] = "pil"
    if shutil.which("ffmpeg"):
        caps["video"] = "ffmpeg"
    return caps


_CAPS = probe()


def _ensure_hwc(arr: np.ndarray) -> np.ndarray:
    """Normalize to (h, w, ch) uint8 — PIL returns (h, w) for mode L."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr.astype(np.uint8, copy=False)


def decode_image(data: bytes) -> np.ndarray:
    """bytes -> uint8 (h, w, ch). PIL when importable (also unlocks
    WebP/...), else the pure decoders: PNG (lossless, byte-identical to
    PIL) and JPEG, baseline AND progressive (functions/jpeg.py —
    float64 IDCT; libjpeg's integer IDCT agrees within +-1)."""
    if _CAPS["image"] == "pil":
        from PIL import Image

        return _ensure_hwc(np.asarray(Image.open(io.BytesIO(data))))
    if data[:2] == b"\xff\xd8":
        from codd_spark.functions.jpeg import decode_jpeg

        return _ensure_hwc(decode_jpeg(data))
    return _ensure_hwc(imaging.decode_png(data))


def image_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) without a full decode. PNG and JPEG
    headers are parsed directly by the pure backends (O(header), and the
    JPEG SOF scan is cheaper than a PIL open — component counts match
    PIL's band counts, so backends report identically); other containers
    (WebP/GIF/...) need PIL."""
    if data[:8] == _PNG_SIG:
        w, h, _depth, _color, ch = imaging.png_info(data)
        return w, h, ch
    if data[:2] == b"\xff\xd8":
        return imaging.jpeg_info(data)
    if _CAPS["image"] == "pil":
        from PIL import Image

        img = Image.open(io.BytesIO(data))
        return img.width, img.height, len(img.getbands())
    raise ValueError(
        "unsupported image container for the pure-Python backend "
        "(PNG only; install PIL for JPEG/WebP/...)"
    )


def decode_audio(data: bytes) -> dict:
    """WAV via the stdlib-backed pure decoder (native backends add
    nothing for PCM WAV; compressed audio would route through ffmpeg —
    same gate as video)."""
    return imaging.decode_wav(data)


def video_frames(data: bytes) -> list[np.ndarray]:
    """bytes -> list of uint8 (h, w, ch) frames. APNG decodes everywhere
    (pure frame walk); other containers (mp4/webm/...) require ffmpeg on
    PATH and are rejected with a clear error without it."""
    if data[:8] == _PNG_SIG:
        return imaging.apng_frames(data)
    if _CAPS["video"] == "ffmpeg":
        return _ffmpeg_frames(data)
    raise ValueError(
        "unsupported video container for the pure-Python backend "
        "(APNG only; install ffmpeg for mp4/webm/...)"
    )


def _ffmpeg_frames(data: bytes) -> list[np.ndarray]:
    """Decode an arbitrary container by shelling out to ffmpeg and
    reading back per-frame PNGs through the TESTED pure decoder — one
    subprocess per video, bounded by the mapInPandas batch size."""
    with tempfile.TemporaryDirectory(prefix="codd-ffmpeg-") as d:
        src = f"{d}/in.bin"
        with open(src, "wb") as f:
            f.write(data)
        subprocess.run(
            ["ffmpeg", "-v", "error", "-i", src, f"{d}/f-%06d.png"],
            check=True,
            capture_output=True,
        )
        import os

        frames = []
        for name in sorted(os.listdir(d)):
            if name.startswith("f-") and name.endswith(".png"):
                with open(f"{d}/{name}", "rb") as f:
                    frames.append(_ensure_hwc(imaging.decode_png(f.read())))
        if not frames:
            raise ValueError("ffmpeg produced no frames (corrupt payload?)")
        return frames


def frame_iter(data: bytes) -> Iterator[tuple[int, np.ndarray]]:
    """(frame_index, array) pairs — the shape frame_sample consumes."""
    for i, arr in enumerate(video_frames(data)):
        yield i, arr
