"""Stdlib/numpy media codecs — the formats decodable WITHOUT codec libraries.

Mirrors the documents.py policy (stdlib zipfile-DOCX / zlib-PDF): the
container has no PIL/librosa/pyav, but several real formats need nothing
beyond the standard library + numpy:

- PNG   — chunk walk, IHDR metadata, full pixel decode for the common class
          (8-bit gray/RGB/RGBA(+alpha), non-interlaced) via zlib + scanline
          unfiltering (filters 0-4 incl. Paeth)
- BMP   — uncompressed 24/32-bit BI_RGB struct parse (bottom-up + padding)
- PPM   — P6 binary RGB (maxval ≤ 255)
- WAV   — stdlib ``wave``: PCM frames, channels, rate, duration

Everything else (JPEG/MP3/MP4-class codecs) stays honestly stubbed in
operators/multimodal.py. These decoders run inside Arrow-batched mapInPandas
with per-row poison-pill isolation; the per-byte python unfilter loop is
fixture/thumbnail-scale — a production image path swaps in a turbo codec at
the same integration point (multimodal.decode_media's probe).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff(content: bytes) -> str | None:
    """Magic-byte format sniff for the stdlib-decodable formats."""
    if content[:8] == _PNG_SIG:
        return "png"
    if content[:2] == b"BM":
        return "bmp"
    if content[:2] in (b"P6", b"P3"):
        return "ppm"
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    return None


# --- PNG ---------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(content: bytes):
    pos = 8
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos:pos + 4])
        ctype = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc


def png_meta(content: bytes) -> dict | None:
    """(width, height, bit_depth, color_type, interlace) from IHDR."""
    if content[:8] != _PNG_SIG:
        return None
    for ctype, data in _png_chunks(content):
        if ctype == b"IHDR" and len(data) >= 13:
            w, h, depth, ct, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            return {"width": w, "height": h, "bit_depth": depth,
                    "color_type": ct, "interlace": interlace}
        break  # IHDR must be first
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(content: bytes) -> np.ndarray | None:
    """Full pixel decode for 8-bit non-interlaced gray/RGB/RGBA: returns
    (H, W, channels) uint8, or None when the PNG is outside the supported
    class (caller falls back to metadata-only)."""
    meta = png_meta(content)
    if (
        meta is None
        or meta["bit_depth"] != 8
        or meta["interlace"] != 0
        or meta["color_type"] not in _PNG_CHANNELS
    ):
        return None
    idat = b"".join(d for t, d in _png_chunks(content) if t == b"IDAT")
    if not idat:
        return None
    raw = zlib.decompress(idat)
    w, h = meta["width"], meta["height"]
    ch = _PNG_CHANNELS[meta["color_type"]]
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            return None
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = row
    return out.reshape(h, w, ch)


# --- BMP ---------------------------------------------------------------------


def bmp_meta(content: bytes) -> dict | None:
    if content[:2] != b"BM" or len(content) < 54:
        return None
    w, h = struct.unpack("<ii", content[18:26])
    bpp, comp = struct.unpack("<HI", content[28:34])
    return {"width": w, "height": abs(h), "bottom_up": h > 0,
            "bpp": bpp, "compression": comp}


def decode_bmp(content: bytes) -> np.ndarray | None:
    """Uncompressed 24/32-bit BI_RGB → (H, W, 3) uint8 RGB."""
    meta = bmp_meta(content)
    if meta is None or meta["compression"] != 0 or meta["bpp"] not in (24, 32):
        return None
    (offset,) = struct.unpack("<I", content[10:14])
    w, h, bpp = meta["width"], meta["height"], meta["bpp"]
    bytes_px = bpp // 8
    row_bytes = (w * bytes_px + 3) & ~3  # rows pad to 4 bytes
    need = offset + row_bytes * h
    if len(content) < need:
        return None
    rows = np.frombuffer(
        content[offset:need], dtype=np.uint8
    ).reshape(h, row_bytes)[:, : w * bytes_px].reshape(h, w, bytes_px)
    if meta["bottom_up"]:
        rows = rows[::-1]
    return rows[:, :, 2::-1].copy()  # BGR(A) → RGB, drop alpha


# --- PPM ---------------------------------------------------------------------


def decode_ppm(content: bytes) -> np.ndarray | None:
    """P6 binary RGB, maxval ≤ 255 → (H, W, 3) uint8."""
    if content[:2] != b"P6":
        return None
    # header: P6 <w> <h> <maxval> with whitespace/# comments
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(content):
        c = content[pos:pos + 1]
        if c == b"#":
            pos = content.find(b"\n", pos)
            if pos < 0:
                return None
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(content) and not content[end:end + 1].isspace():
                end += 1
            fields.append(int(content[pos:end]))
            pos = end
    if len(fields) < 3 or fields[2] > 255:
        return None
    w, h = fields[0], fields[1]
    pos += 1  # single whitespace after maxval
    pix = content[pos:pos + w * h * 3]
    if len(pix) < w * h * 3:
        return None
    return np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3).copy()


# --- WAV ---------------------------------------------------------------------


def wav_meta(content: bytes) -> dict | None:
    """PCM WAV via stdlib wave: channels, rate, duration, sample count."""
    import wave

    try:
        with wave.open(io.BytesIO(content)) as w:
            frames, rate = w.getnframes(), w.getframerate()
            return {
                "channels": w.getnchannels(),
                "sample_rate": rate,
                "sample_width": w.getsampwidth(),
                "n_frames": frames,
                "duration_ms": int(round(frames * 1000 / rate)) if rate else 0,
            }
    except Exception:  # noqa: BLE001 — not a (supported) wav
        return None


def decode_wav(content: bytes) -> np.ndarray | None:
    """PCM samples as (n_frames, channels) int16/uint8."""
    import wave

    meta = wav_meta(content)
    if meta is None or meta["sample_width"] not in (1, 2):
        return None
    with wave.open(io.BytesIO(content)) as w:
        raw = w.readframes(meta["n_frames"])
    dt = np.int16 if meta["sample_width"] == 2 else np.uint8
    arr = np.frombuffer(raw, dtype=dt)
    return arr.reshape(-1, meta["channels"])


# --- unified probe -----------------------------------------------------------


def probe(content: bytes) -> dict | None:
    """Sniff + metadata for any stdlib-decodable container; None otherwise.
    Returns {'format', 'width'?, 'height'?, 'duration_ms'?}."""
    fmt = sniff(content)
    if fmt == "png":
        m = png_meta(content)
        return {"format": "png", "width": m["width"], "height": m["height"]} if m else None
    if fmt == "bmp":
        m = bmp_meta(content)
        return {"format": "bmp", "width": m["width"], "height": m["height"]} if m else None
    if fmt == "ppm":
        a = decode_ppm(content)
        return {"format": "ppm", "width": a.shape[1], "height": a.shape[0]} if a is not None else None
    if fmt == "wav":
        m = wav_meta(content)
        return {"format": "wav", "duration_ms": m["duration_ms"]} if m else None
    return None


def decode_image_array(content: bytes) -> np.ndarray | None:
    """(H, W, C) uint8 for PNG/BMP/PPM; None for anything else."""
    fmt = sniff(content)
    if fmt == "png":
        return decode_png(content)
    if fmt == "bmp":
        return decode_bmp(content)
    if fmt == "ppm":
        return decode_ppm(content)
    return None


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, C) — pure numpy indexing,
    the real thing (what cv2.INTER_NEAREST does), no codec lib needed."""
    ys = (np.arange(height) * img.shape[0]) // height
    xs = (np.arange(width) * img.shape[1]) // width
    return img[ys][:, xs]
