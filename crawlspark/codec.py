"""Deterministic image codecs + perceptual hash (pure numpy/stdlib).

The reference downloads image bytes to disk (src/crawler/crawler.py:585-596)
and the legacy path decodes them with cv2 (legacy/crawler_legacy.py:326-328).
This sandbox has no image libraries (no PIL/cv2), so per the graft brief the
codecs here are deterministic stand-ins with REAL Spark-side plumbing:

- ``png``  : a real, spec-conformant minimal PNG encoder/decoder
             (8-bit RGB, zlib, filter 0) — lossless.
- ``gif``  : deterministic lossless container (``FGIF`` magic + zlib raw).
- ``jpeg`` / ``jpg`` / ``webp`` : deterministic *lossy* codec — 6-bit
             quantization (keep top 6 bits, reconstruct at bin midpoint)
             + zlib.  Max abs error 2 → PSNR ≈ 46 dB, i.e. the BASELINE
             per-row invariant (PSNR ≥ 40 dB for lossy fmt) is meaningful
             and actually exercised.

phash is a 64-bit average-hash over an 8x8 block-mean downsample of the
grayscale image, returned as a signed int64 (the `phash:long` column of the
graft input table, BASELINE.json input_hint).

All functions are written to be called on batches from inside pandas UDFs
(see crawlspark/imageops.py); they are deliberately numpy-vectorized per
image with no Python-level pixel loops.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

LOSSY_FMTS = {"jpeg", "jpg", "webp"}
LOSSLESS_FMTS = {"png", "gif"}
ALL_FMTS = sorted(LOSSY_FMTS | LOSSLESS_FMTS)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit RGB HxWx3 -> minimal valid PNG (filter 0 rows)."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # prepend filter byte 0 to each row, vectorized
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if np.any(raw[:, 0] != 0):
        raise ValueError("only filter-0 rows supported (own encoder output)")
    return raw[:, 1:].reshape(h, w, 3).copy()


def _encode_fake(magic: bytes, pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return magic + struct.pack(">II", w, h) + zlib.compress(pixels.tobytes(), 6)


def _decode_fake(magic: bytes, data: bytes) -> np.ndarray:
    if data[:4] != magic:
        raise ValueError(f"bad magic, want {magic!r}")
    w, h = struct.unpack(">II", data[4:12])
    return (
        np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8)
        .reshape(h, w, 3)
        .copy()
    )


def _quantize6(pixels: np.ndarray) -> np.ndarray:
    # keep top 6 bits, reconstruct at bin midpoint; clip keeps uint8 range
    return ((pixels & 0xFC) + 2).clip(0, 255).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode HxWx3 uint8 pixels in the given format (deterministic)."""
    fmt = fmt.lower()
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "gif":
        return _encode_fake(b"FGIF", pixels)
    if fmt in LOSSY_FMTS:
        return _encode_fake(b"FJPG", _quantize6(pixels))
    raise ValueError(f"unknown fmt {fmt}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode bytes -> HxWx3 uint8. Lossy fmts return quantized pixels."""
    fmt = fmt.lower()
    if fmt == "png":
        return decode_png(data)
    if fmt == "gif":
        return _decode_fake(b"FGIF", data)
    if fmt in LOSSY_FMTS:
        return _decode_fake(b"FJPG", data)
    raise ValueError(f"unknown fmt {fmt}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10((255.0 * 255.0) / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit average-hash: 8x8 block-mean grayscale vs its mean.

    Signed int64 (Spark LongType).  w and h must be multiples of 8 (the
    fixture generator guarantees {32, 64, 128}).
    """
    h, w, _ = pixels.shape
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    bh, bw = h // 8, w // 8
    blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return val - (1 << 64) if val >= (1 << 63) else val


# vocabulary for the OCR stand-in (legacy OCR emits Korean text)
_OCR_WORDS = ["아파트", "전세", "매매", "분양", "청약", "금리", "대출", "투자"]


def fake_ocr(pixels: np.ndarray) -> str:
    """Deterministic OCR STAND-IN. The legacy pipeline runs PaddleOCR over
    cv2-decoded bytes (legacy/crawler_legacy.py:322-330); no OCR library
    exists in this container, so this derives a stable token string from
    the decoded pixels — engine and oracle agree byte-for-byte, and the
    Spark-side plumbing (decode → per-image text column joined into the
    record stream) is the real thing."""
    h = hashlib.blake2b(np.ascontiguousarray(pixels).tobytes(), digest_size=8)
    d = h.digest()
    words = [_OCR_WORDS[b % len(_OCR_WORDS)] for b in d[:3]]
    return " ".join(words) + " #" + d.hex()[:6]


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic pixel content for a synthetic image id (seeded PCG64)."""
    seed = int.from_bytes(
        hashlib.blake2b(image_id.encode(), digest_size=8).digest(), "big"
    )
    rng = np.random.Generator(np.random.PCG64(seed))
    # smooth-ish gradient + noise: more realistic than pure noise for phash
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255 // max(w - 1, 1)) + (yy * 255 // max(h - 1, 1))) // 2
    noise = rng.integers(0, 64, size=(h, w, 3), dtype=np.int64)
    return ((base[:, :, None] * 3 + noise * 2) % 256).astype(np.uint8)


# --------------------------------------------------------------- documents
# Deterministic attachment-payload stand-ins (reference downloads real
# pdf/pptx/docx/hwp/xlsx files, crawler.py:467-501 + legacy:743-777; the
# document libraries are not in this container). Every payload is an
# 8-byte format magic + the UTF-8 text body, so the Spark-side extract
# stage can decode the text with pure JVM expressions
# (decode(substring(payload, 9, ...), 'UTF-8')) — no UDF.

DOC_MAGIC = {
    "pdf": b"%PDF-1.7",
    "pptx": b"PK\x03\x04PPTX",
    "docx": b"PK\x03\x04DOCX",
    "xlsx": b"PK\x03\x04XLSX",
    "hwp": b"HWP-DOC5",
}
DOC_MAGIC_LEN = 8  # every magic is exactly 8 bytes (JVM-side fixed skip)

_DOC_WORDS = [
    "부동산", "시장", "분석", "보고서", "투자", "전략", "금리", "전망",
    "아파트", "지역", "통계", "요약",
]


def doc_text(url: str) -> str:
    """Deterministic document text for a synthetic attachment URL —
    cross-process stable (sha256, never Python hash())."""
    h = hashlib.sha256(url.encode()).hexdigest()
    words = [_DOC_WORDS[int(h[i : i + 2], 16) % len(_DOC_WORDS)] for i in range(0, 16, 2)]
    return " ".join(words) + " #" + h[:12]


def encode_doc(url: str, fmt: str) -> bytes:
    """Attachment payload: 8-byte magic + deterministic UTF-8 text body."""
    magic = DOC_MAGIC.get(fmt.lower())
    if magic is None:
        raise ValueError(f"unknown doc fmt {fmt}")
    assert len(magic) == DOC_MAGIC_LEN
    return magic + doc_text(url).encode("utf-8")


def decode_doc(data: bytes, fmt: str) -> str:
    """Extract the text body; raises on magic mismatch like a real parser."""
    magic = DOC_MAGIC.get(fmt.lower())
    if magic is None or not data.startswith(magic):
        raise ValueError(f"bad {fmt} payload")
    return data[DOC_MAGIC_LEN:].decode("utf-8")
