"""Real image codecs for UNCOMPRESSED formats, in pure numpy.

The container has no Pillow/ffmpeg, but binary PPM (P6) and 24-bit
uncompressed BMP need nothing beyond header parsing and a reshape — so
the multimodal pipeline's decode/resize/feature kernels are REAL for
these formats (exact pixels in, exact pixels out), and only the
compressed formats (JPEG/PNG/video) remain behind the documented
``NotImplementedError`` stubs.

All functions are plain bytes/ndarray transforms so the Arrow-batched
``mapInPandas`` wrappers in ``multimodal.py`` stay the only Spark-facing
surface.
"""

from __future__ import annotations

import numpy as np


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 array of shape (H, W, 3).

    Header: ``P6 <width> <height> <maxval>\\n`` with ``#`` comments
    allowed between tokens; maxval must be ≤ 255 (1 byte per sample).
    """
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # tokenize the header: 4 tokens (magic, w, h, maxval), skipping
    # comment lines; the pixel block starts after the single whitespace
    # byte that follows maxval
    tokens: list[bytes] = []
    i = 0
    n = len(payload)
    while len(tokens) < 4 and i < n:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    if len(tokens) < 4:
        # truncated header must be the documented malformed-input
        # ValueError, not an IndexError from tokens[3]
        raise ValueError("truncated PPM header")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    expect = w * h * 3
    pix = np.frombuffer(payload, dtype=np.uint8, count=expect, offset=i)
    return pix.reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6) bytes."""
    h, w = arr.shape[:2]
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_bmp24(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → uint8 array of shape (H, W, 3) in RGB.

    Handles the standard BITMAPINFOHEADER layout: 4-byte-aligned rows,
    bottom-up scan order (negative heights = top-down), BGR sample
    order.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = int.from_bytes(payload[10:14], "little")
    header_size = int.from_bytes(payload[14:18], "little")
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_offset
    ).reshape(h, row_bytes)
    img = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps — the exact,
    dependency-free kernel (pixel-center convention: source index
    floor((i + 0.5) * src/dst))."""
    src_h, src_w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * src_h / height).astype(np.int64), src_h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * src_w / width).astype(np.int64), src_w - 1)
    return arr[ys][:, xs]


#: Output dimensionality of ``image_features`` at its default
#: ``luma_bins``: 3 channel means + 3 channel stds + the histogram.
#: Consumers needing a shape-matched degraded row (null payload) must use
#: this instead of hardcoding 10, so a feature-set change cannot silently
#: desync real and degraded vectors.
IMAGE_FEATURE_LUMA_BINS = 4
IMAGE_FEATURE_DIM = 6 + IMAGE_FEATURE_LUMA_BINS


def image_features(
    arr: np.ndarray, luma_bins: int = IMAGE_FEATURE_LUMA_BINS
) -> list[float]:
    """Real image features: per-channel mean and std plus a normalized
    luminance histogram — 6 + ``luma_bins`` dims, all from actual
    pixels."""
    f = arr.reshape(-1, 3).astype(np.float64)
    means = f.mean(axis=0)
    stds = f.std(axis=0)
    luma = f @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=luma_bins, range=(0.0, 255.0 + 1e-9))
    hist = hist / max(len(luma), 1)
    return [*means.tolist(), *stds.tolist(), *hist.tolist()]


def decode_image(payload: bytes, mime: str | None = None) -> np.ndarray:
    """Dispatch on magic bytes (mime is advisory): PPM/BMP decode for
    real; anything else raises — the caller's stub/raise policy
    applies."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp24(payload)
    raise NotImplementedError(
        f"compressed format not decodable without Pillow (mime={mime!r})"
    )


# --- audio: RIFF/WAVE PCM ---------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 → (int16 array of shape (n_samples, channels),
    sample_rate). Walks the chunk list properly (fmt/data may be
    preceded by LIST/fact chunks); only uncompressed PCM-16 decodes."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    fmt = None
    data = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError("only uncompressed PCM-16 supported")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, channels).copy(), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) int16 → RIFF/WAVE PCM-16 bytes."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    n, ch = arr.shape
    body = arr.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = (
        (1).to_bytes(2, "little")
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(body).to_bytes(4, "little") + body
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks


def audio_features(samples: np.ndarray) -> list[float]:
    """Per-channel mean, RMS, zero-crossing rate (strict sign product
    < 0 between consecutive samples), and peak |amplitude| — the cheap
    audio screens (silence/clipping/DC-offset detectors). Channel-major
    feature order."""
    f = samples.astype(np.float64)
    out: list[float] = []
    n = f.shape[0]
    for c in range(f.shape[1]):
        x = f[:, c]
        out.append(x.mean())
        out.append(float(np.sqrt((x * x).mean())))
        out.append(
            float((x[:-1] * x[1:] < 0).sum() / (n - 1)) if n > 1 else 0.0
        )
        out.append(float(np.abs(x).max()) if n else 0.0)
    return out
