"""Real-decode kernels for uncompressed image formats: pixel-exact
codec unit tests plus the Spark mapInPandas integration — upgrading the
multimodal decode path from "honest stub" to "real for PPM/BMP"."""

from __future__ import annotations

import numpy as np
import pytest

from ra2_datalake_linaresjoan_spark.llmdata.numpy_codecs import (
    decode_bmp24,
    decode_image,
    decode_ppm,
    encode_ppm,
    image_features,
    resize_nearest,
)


def _checker(h=2, w=2):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 0]
    img[1, 1] = [0, 0, 255]
    img[0, 1] = [0, 255, 0]
    return img


def test_ppm_roundtrip_exact():
    img = _checker()
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_header_comments_supported():
    img = _checker()
    raw = encode_ppm(img)
    commented = b"P6\n# a comment line\n2 2\n# another\n255\n" + raw.split(b"255\n", 1)[1]
    assert np.array_equal(decode_ppm(commented), img)


def _encode_bmp24(img: np.ndarray, top_down: bool = False) -> bytes:
    """Hand-rolled 24-bit BMP writer (test-side ground truth)."""
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    bgr = img[:, :, ::-1]
    rows = bgr if top_down else bgr[::-1]
    body = b"".join(
        rows[r].tobytes() + b"\0" * (row_bytes - w * 3) for r in range(h)
    )
    data_offset = 54
    header = (
        b"BM"
        + (data_offset + len(body)).to_bytes(4, "little")
        + b"\0\0\0\0"
        + data_offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (-h if top_down else h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\0" * 16
    )
    return header + body


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp24_decode_exact(top_down):
    img = _checker(3, 2)  # odd row width exercises 4-byte padding
    assert np.array_equal(decode_bmp24(_encode_bmp24(img, top_down)), img)


def test_resize_nearest_upscale_exact():
    img = _checker()
    up = resize_nearest(img, 4, 4)
    # each source pixel becomes a 2x2 block under pixel-center mapping
    for y in range(4):
        for x in range(4):
            assert np.array_equal(up[y, x], img[y // 2, x // 2])


def test_resize_nearest_downscale_identity_centers():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    down = resize_nearest(img, 2, 2)
    # pixel-center convention picks source indices 1 and 3
    assert np.array_equal(down, img[[1, 3]][:, [1, 3]])


def test_image_features_known_values():
    img = np.zeros((1, 2, 3), dtype=np.uint8)
    img[0, 1] = [255, 255, 255]
    f = image_features(img, luma_bins=4)
    assert f[:3] == [127.5, 127.5, 127.5]
    # one black + one white pixel: luma 0 and 255 -> first and last bins
    assert f[6] == 0.5 and f[9] == 0.5 and f[7] == 0.0 and f[8] == 0.0


def test_decode_image_dispatch_and_gate():
    img = _checker()
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    assert np.array_equal(decode_image(_encode_bmp24(img)), img)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_spark_numpy_decode_features_and_resize(spark):
    """End-to-end through the Arrow-batched mapInPandas wrappers: real
    pixels in, real features and a pixel-exact resized PPM out."""
    from ra2_datalake_linaresjoan_spark.llmdata.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_images,
    )

    imgs = {1: _checker(), 2: np.full((3, 3, 3), 9, dtype=np.uint8)}
    rows = [
        (
            mid,
            bytearray(encode_ppm(img)),
            ("image", "image/x-portable-pixmap", img.shape[1], img.shape[0], None),
        )
        for mid, img in imgs.items()
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {
        r["media_id"]: r["feature"]
        for r in extract_features(media, decode_mode="numpy").collect()
    }
    for mid, img in imgs.items():
        assert feats[mid] == pytest.approx(image_features(img))

    resized = {
        r["media_id"]: r for r in resize_images(media, 4, 4, decode_mode="numpy").collect()
    }
    for mid, img in imgs.items():
        out = decode_ppm(bytes(resized[mid]["payload"]))
        assert out.shape == (4, 4, 3)
        assert np.array_equal(out, resize_nearest(img, 4, 4))


def test_spark_numpy_decode_tolerates_null_and_empty_payloads(spark):
    """Null/empty payloads (the schema allows both) must degrade like the
    stub path instead of crashing the numpy decoder: zero features from
    extract_features, a black target-size image from resize_images."""
    from ra2_datalake_linaresjoan_spark.llmdata.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_images,
    )

    img = _checker()
    meta = ("image", "image/x-portable-pixmap", 2, 2, None)
    rows = [
        (1, bytearray(encode_ppm(img)), meta),
        (2, None, meta),
        (3, bytearray(b""), meta),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {
        r["media_id"]: r for r in extract_features(media, decode_mode="numpy").collect()
    }
    assert feats[1]["feature"] == pytest.approx(image_features(img))
    for mid in (2, 3):
        assert feats[mid]["feature"] == [0.0] * 10
        assert feats[mid]["n_bytes"] == 0

    resized = {
        r["media_id"]: r
        for r in resize_images(media, 4, 4, decode_mode="numpy").collect()
    }
    assert np.array_equal(
        decode_ppm(bytes(resized[1]["payload"])), resize_nearest(img, 4, 4)
    )
    for mid in (2, 3):
        out = decode_ppm(bytes(resized[mid]["payload"]))
        assert out.shape == (4, 4, 3) and not out.any()


def test_wav_roundtrip_and_chunk_walk():
    from ra2_datalake_linaresjoan_spark.llmdata.numpy_codecs import (
        decode_wav,
        encode_wav,
    )

    s = (np.arange(16, dtype=np.int16).reshape(8, 2) - 8).astype(np.int16)
    raw = encode_wav(s, 16_000)
    dec, sr = decode_wav(raw)
    assert sr == 16_000 and np.array_equal(dec, s)
    # an extra LIST chunk before fmt/data must be skipped, odd sizes padded
    extra = b"RIFF" + (len(raw) - 8 + 12).to_bytes(4, "little") + b"WAVE"
    extra += b"LIST" + (3).to_bytes(4, "little") + b"abc\0"  # odd size + pad
    extra += raw[12:]
    dec2, sr2 = decode_wav(extra)
    assert sr2 == 16_000 and np.array_equal(dec2, s)


def test_audio_features_known_values():
    from ra2_datalake_linaresjoan_spark.llmdata.numpy_codecs import audio_features

    s = np.array([[100, 0], [-100, 0], [100, 0], [-100, 0]], dtype=np.int16)
    f = audio_features(s)
    # ch0: mean 0, rms 100, zcr 3/3 = 1.0, peak 100; ch1: silence
    assert f[0] == 0.0 and f[1] == 100.0 and f[2] == 1.0 and f[3] == 100.0
    assert f[4] == 0.0 and f[5] == 0.0 and f[6] == 0.0 and f[7] == 0.0


def test_wav_rejects_non_pcm():
    from ra2_datalake_linaresjoan_spark.llmdata.numpy_codecs import (
        decode_wav,
        encode_wav,
    )

    raw = bytearray(encode_wav(np.zeros((4, 1), dtype=np.int16), 8000))
    raw[20:22] = (3).to_bytes(2, "little")  # IEEE float format tag
    with pytest.raises(ValueError, match="PCM-16"):
        decode_wav(bytes(raw))
