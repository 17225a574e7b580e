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
- JPEG  — baseline sequential DCT (SOF0, Huffman): full pixel decode for
          grayscale / YCbCr 4:4:4 / 4:2:2 / 4:2:0 with restart intervals,
          plus a fixture encoder (Annex K tables); progressive (SOF2) and
          arithmetic-coded stay metadata-only / stubbed
- GIF   — 87a/89a first frame: palette + variable-width LZW + interlace,
          composited onto the logical-screen canvas, plus a real greedy-LZW
          fixture encoder
- TIFF  — II/MM first IFD: uncompressed 8-bit gray/RGB chunky strips, plus
          a fixture encoder; LZW/JPEG-in-TIFF stay metadata-only

Everything else (MP3/MP4-class codecs) stays honestly stubbed in
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
    if content[:2] == b"\xFF\xD8":
        return "jpeg"
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
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
    w, h = meta["width"], meta["height"]
    ch = _PNG_CHANNELS[meta["color_type"]]
    # decompression-bomb defense (same _GIF_MAX_PIXELS budget as the other
    # codecs): refuse the claimed geometry BEFORE inflating, and cap the
    # inflater at the exact expected output so a zlib bomb behind small
    # claimed dims can never materialize more than stride·h bytes
    if w == 0 or h == 0 or w * h > _GIF_MAX_PIXELS:
        return None
    stride = w * ch
    expected = h * (stride + 1)
    try:
        raw = zlib.decompressobj().decompress(idat, expected + 1)
    except zlib.error:
        return None
    if len(raw) != expected:
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
    Returns {'format', 'width'?, 'height'?, 'duration_ms'?}. Contract: a
    non-None image probe implies the matching decoder can decode the class
    (so decode_media's 'ok' status never overstates) — hence the progressive
    -JPEG, non-baseline-TIFF, and pixel-ceiling guards below."""
    out = _probe_inner(content)
    if out is not None and "width" in out:
        # decoders refuse frames over the decompression-bomb ceiling AND
        # zero-dimension frames, so a probe reporting such dims would be an
        # 'ok' row that can't decode
        w, h = out["width"], out["height"]
        if w == 0 or h == 0 or w * h > _GIF_MAX_PIXELS:
            return None
    return out


def _probe_inner(content: bytes) -> dict | None:
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
    if fmt == "jpeg":
        m = jpeg_meta(content)
        # progressive JPEGs have true dims in SOF2 but no pixel decode here —
        # report metadata only when the baseline decoder can actually decode
        if m and not m["progressive"]:
            return {"format": "jpeg", "width": m["width"], "height": m["height"]}
        return None
    if fmt == "gif":
        m = gif_meta(content)
        return {"format": "gif", "width": m["width"], "height": m["height"]} if m else None
    if fmt == "tiff":
        m = tiff_meta(content)
        # mirror the JPEG progressive guard: report metadata only for the
        # class decode_tiff can actually decode — an LZW/planar/16-bit TIFF
        # would otherwise get decode_status 'ok' while resize falls back to
        # the ok_stub byte-fold (status overstating what was decoded)
        if m and m["decodable"]:
            return {"format": "tiff", "width": m["width"], "height": m["height"]}
        return None
    return None


def decode_image_array(content: bytes) -> np.ndarray | None:
    """(H, W, C) uint8 for PNG/BMP/PPM/baseline-JPEG; None otherwise."""
    fmt = sniff(content)
    if fmt == "png":
        return decode_png(content)
    if fmt == "bmp":
        return decode_bmp(content)
    if fmt == "ppm":
        return decode_ppm(content)
    if fmt == "jpeg":
        img = decode_jpeg(content)
        if img is not None and img.ndim == 2:
            img = img[:, :, None]
        return img
    if fmt == "gif":
        return decode_gif(content)
    if fmt == "tiff":
        return decode_tiff(content)
    return None


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, C) — pure numpy indexing,
    the real thing (what cv2.INTER_NEAREST does), no codec lib needed."""
    ys = (np.arange(height) * img.shape[0]) // height
    xs = (np.arange(width) * img.shape[1]) // width
    return img[ys][:, xs]


# --- JPEG (baseline sequential DCT, Huffman) ---------------------------------
# Pure stdlib+numpy baseline-JPEG codec (ITU-T T.81 / Annex K tables, public
# spec). Decoder handles the common class: SOF0, 8-bit, Huffman, grayscale /
# YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, restart intervals. Progressive
# (SOF2), arithmetic coding, and 12-bit stay honestly undecoded (None →
# callers keep the ok_stub path). The encoder exists for byte-stable
# fixtures (synth.minimal_jpeg_bytes): 4:4:4, Annex K quant + Huffman
# tables, IJG quality scaling.

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
_HUFF_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    m = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8)
    m[0] /= np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()


def _build_huff_decode(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: {(length, code): symbol}."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return out


def _build_huff_encode(bits: list[int], vals: list[int]) -> dict:
    return {sym: (ln, code) for (ln, code), sym in
            _build_huff_decode(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.buf, self.nbits = 0, 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: caller resyncs
            else:
                return False  # EOI or other marker
        else:
            self.pos += 1
        # mask to nbits: without it buf grows one byte per fill and every
        # read_bit shift becomes an ever-larger bigint op — decode time goes
        # quadratic in entropy-stream size on marker-free streams
        self.buf = (((self.buf << 8) | b) & ((1 << (self.nbits + 8)) - 1))
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise EOFError
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just after the next RSTn marker, reset bit state."""
        d = self.data
        self.buf, self.nbits = 0, 0
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise EOFError


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def jpeg_meta(content: bytes) -> dict | None:
    """(width, height, n_components, progressive) from the first SOF."""
    if content[:2] != b"\xFF\xD8":
        return None
    pos = 2
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            return None
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", content[pos + 2:pos + 4])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w, nc = struct.unpack(">HHB", content[pos + 5:pos + 10])
            return {"width": w, "height": h, "n_components": nc,
                    "progressive": marker == 0xC2}
        if marker == 0xD9:
            return None
        pos += 2 + seglen
    return None


def decode_jpeg(content: bytes) -> np.ndarray | None:  # noqa: C901
    """Baseline-JPEG pixel decode → (H, W) or (H, W, 3) uint8, or None
    outside the supported class (progressive/arithmetic/12-bit/>3 comps)."""
    if content[:2] != b"\xFF\xD8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → table
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    pos = 2
    try:
        while pos + 4 <= len(content):
            if content[pos] != 0xFF:
                return None
            marker = content[pos + 1]
            if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:
                return None  # EOI before SOS
            (seglen,) = struct.unpack(">H", content[pos + 2:pos + 4])
            seg = content[pos + 4:pos + 2 + seglen]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0xF
                    if pq != 0:
                        return None  # 16-bit tables unsupported
                    tbl = np.zeros(64, dtype=np.int64)
                    tbl[_ZIGZAG] = np.frombuffer(
                        seg[i + 1:i + 65], dtype=np.uint8
                    ).astype(np.int64)
                    qt[tq] = tbl.reshape(8, 8)
                    i += 65
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0xF
                    bits = list(seg[i + 1:i + 17])
                    n = sum(bits)
                    vals = list(seg[i + 17:i + 17 + n])
                    huff[(tc, th)] = _build_huff_decode(bits, vals)
                    i += 17 + n
            elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
                prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
                if prec != 8 or nc not in (1, 3):
                    return None
                # decompression-bomb ceiling (same _GIF_MAX_PIXELS budget as
                # GIF/TIFF): a crafted SOF can claim 65535×65535, which would
                # allocate ~34 GB of float64 planes and drive ~268M MCU loop
                # iterations before the entropy stream is ever validated
                if w * h > _GIF_MAX_PIXELS:
                    return None
                comps = []
                for ci in range(nc):
                    cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                    ch_, cv_ = hv >> 4, hv & 0xF
                    # T.81 allows 1..4; zero would divide-by-zero below and
                    # non-power-of-2 ratios break the replicate upsample
                    if ch_ not in (1, 2, 4) or cv_ not in (1, 2, 4):
                        return None
                    comps.append({"id": cid, "h": ch_, "v": cv_, "tq": tq})
            elif 0xC2 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return None  # progressive / other SOF classes
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", seg[:2])
            elif marker == 0xDA:  # SOS
                ns = seg[0]
                for si in range(ns):
                    cs, tbl = seg[1 + 2 * si], seg[2 + 2 * si]
                    for c in comps:
                        if c["id"] == cs:
                            c["dc"], c["ac"] = tbl >> 4, tbl & 0xF
                pos = pos + 2 + seglen
                break
            pos += 2 + seglen
        else:
            return None
        if not comps or w == 0 or h == 0:
            return None

        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        planes = [
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
            for c in comps
        ]
        r = _BitReader(content, pos)
        pred = [0] * len(comps)
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and \
                        mcu_count % restart_interval == 0:
                    r.sync_restart()
                    pred = [0] * len(comps)
                mcu_count += 1
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = np.zeros(64, dtype=np.int64)
                            t = _huff_decode(r, huff[(0, c["dc"])])
                            if t > 15:  # T.81 DC category ≤ 11 (8-bit)
                                return None
                            diff = _extend(r.receive(t), t) if t else 0
                            pred[ci] += diff
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(r, huff[(1, c["ac"])])
                                rr, ss = rs >> 4, rs & 0xF
                                if ss == 0:
                                    if rr == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += rr
                                if k > 63:
                                    return None
                                zz[k] = _extend(r.receive(ss), ss)
                                k += 1
                            blk = np.zeros(64, dtype=np.int64)
                            blk[_ZIGZAG] = zz
                            f = blk.reshape(8, 8) * qt[c["tq"]]
                            pix = _DCT_M.T @ f @ _DCT_M + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
        full = []
        for c, p in zip(comps, planes):
            if c["h"] != hmax or c["v"] != vmax:
                # sampling ratios are powers of 2 (validated at SOF), and
                # T.81 requires each factor to divide the max — reject the
                # rest rather than mis-upsample
                if vmax % c["v"] or hmax % c["h"]:
                    return None
                p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                              hmax // c["h"], axis=1)
            full.append(p[:h, :w])
        if len(full) == 1:
            return np.clip(full[0].round(), 0, 255).astype(np.uint8)
        y, cb, cr = full
        rr = y + 1.402 * (cr - 128.0)
        gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bb = y + 1.772 * (cb - 128.0)
        return np.clip(np.stack([rr, gg, bb], axis=-1).round(), 0, 255).astype(
            np.uint8
        )
    # the promised contract is pixels-or-None: any malformed stream lands
    # here, never an exception out of the decoder (ZeroDivisionError guards
    # against degenerate geometry slipping past the marker validation)
    except (EOFError, ValueError, KeyError, struct.error, IndexError,
            ZeroDivisionError, OverflowError, MemoryError):
        # MemoryError is a best-effort backstop behind the pixel ceiling —
        # the decode_media poison-pill isolation can't catch an executor
        # OOM-kill, so the ceiling above is the real defense
        return None


# --- JPEG encoder (fixtures) -------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)  # pad with 1-bits


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category + value bits for a signed coefficient."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_block(bw: _BitWriter, blk: np.ndarray, qt_: np.ndarray,
                  pred: int, dc_tab: dict, ac_tab: dict) -> int:
    """FDCT + quantize + Huffman-encode one 8×8 block; returns the new DC
    predictor."""
    f = _DCT_M @ (blk - 128.0) @ _DCT_M.T
    qv = np.round(f / qt_.reshape(8, 8)).astype(np.int64)
    zz = qv.reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - pred
    t, bits = _mag_bits(diff)
    ln, code = dc_tab[t]
    bw.write(ln, code)
    if t:
        bw.write(t, bits)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]  # ZRL
            bw.write(ln, code)
            run -= 16
        t, bits = _mag_bits(v)
        ln, code = ac_tab[(run << 4) | t]
        bw.write(ln, code)
        bw.write(t, bits)
        run = 0
    if last_nz < 63:
        ln, code = ac_tab[0x00]  # EOB
        bw.write(ln, code)
    return int(zz[0])


#: sampling layouts: name → (luma_h, luma_v) with chroma fixed at 1×1
_SUBSAMPLE = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: str = "444",
                restart_interval: int = 0) -> bytes:  # noqa: C901
    """Baseline JPEG bytes for (H, W) grayscale or (H, W, 3) RGB uint8 —
    Annex K tables, deterministic (fixture generator). ``subsample``
    ∈ {'444','422','420'} picks the chroma layout (box-filter downsample);
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs — both
    exist chiefly to exercise the decoder's MCU-interleave/upsample/restart
    paths with honest test vectors."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    hs, vs = (1, 1) if gray else _SUBSAMPLE[subsample]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r_, g_, b_ = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r_ + 0.587 * g_ + 0.114 * b_,
            -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0,
            0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0,
        ]
    qts = [_scale_qt(_QT_LUM, quality)]
    if not gray:
        qts.append(_scale_qt(_QT_CHROM, quality))
    enc_dc = [_build_huff_encode(*_HUFF_DC_LUM)]
    enc_ac = [_build_huff_encode(*_HUFF_AC_LUM)]
    if not gray:
        enc_dc.append(_build_huff_encode(*_HUFF_DC_CHROM))
        enc_ac.append(_build_huff_encode(*_HUFF_AC_CHROM))

    # per-component geometry: luma at (hs, vs), chroma at (1, 1)
    comps = [{"h": hs, "v": vs, "ti": 0}]
    if not gray:
        comps += [{"h": 1, "v": 1, "ti": 1}, {"h": 1, "v": 1, "ti": 1}]
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcux, mcuy = -(-w // mcu_w), -(-h // mcu_h)

    def _pad(p: np.ndarray, th: int, tw: int) -> np.ndarray:
        pp = np.empty((th, tw))
        ph_, pw_ = p.shape
        pp[:ph_, :pw_] = p
        pp[ph_:, :pw_] = p[ph_ - 1:ph_, :]
        pp[:, pw_:] = pp[:, pw_ - 1:pw_]
        return pp

    padded = [_pad(planes[0], mcuy * mcu_h, mcux * mcu_w)]
    for p in planes[1:]:
        # box-filter chroma downsample to the component's grid, then pad
        full = _pad(p, mcuy * mcu_h, mcux * mcu_w)
        sub = full.reshape(
            full.shape[0] // vs, vs, full.shape[1] // hs, hs
        ).mean(axis=(1, 3))
        padded.append(sub)

    bw = _BitWriter()
    pred = [0] * len(comps)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                p = padded[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        pred[ci] = _encode_block(
                            bw, p[y0:y0 + 8, x0:x0 + 8],
                            qts[min(c["ti"], len(qts) - 1)], pred[ci],
                            enc_dc[c["ti"]], enc_ac[c["ti"]],
                        )
    bw.flush()

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)
    for tq, qt_ in enumerate(qts):
        zz = qt_.reshape(64)[_ZIGZAG].astype(np.uint8)
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tq) + zz.tobytes()
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    nc = len(comps)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci, c in enumerate(comps):
        out += struct.pack(">BBB", ci + 1, (c["h"] << 4) | c["v"],
                           min(c["ti"], len(qts) - 1))
    specs = [(0x00, _HUFF_DC_LUM), (0x10, _HUFF_AC_LUM)]
    if not gray:
        specs += [(0x01, _HUFF_DC_CHROM), (0x11, _HUFF_AC_CHROM)]
    for tid, (bits, vals) in specs:
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals), tid)
        out += bytes(bits) + bytes(vals)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3F\x00"
    out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)


# --- GIF (87a/89a, LZW) ------------------------------------------------------
# Real stdlib+numpy GIF decode: palette + variable-width LZW + optional
# interlace, first image frame (animation = first frame, the standard
# thumbnail/feature-extraction semantics). The fixture encoder emits the
# spec-valid "uncompressed" LZW form (a CLEAR code before every pixel keeps
# the code width fixed), which still drives the decoder's real dictionary
# and width-growth logic.


def gif_meta(content: bytes) -> dict | None:
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    if len(content) < 13:
        return None
    w, h = struct.unpack("<HH", content[6:10])
    return {"width": w, "height": h, "version": content[3:6].decode("ascii")}


#: absolute pixel ceiling for a decodable frame — 64 MP ≈ 192 MB RGB. A
#: crafted descriptor can claim 65535×65535 (4.3 G px); combined with an
#: LZW bomb (O(n²) expansion) that would OOM the executor before any
#: guard fired. Frames above the ceiling are outside the supported class.
_GIF_MAX_PIXELS = 64 << 20


def _gif_lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    """Indices as a bytearray (1 byte/px — a Python int list costs ~28x and
    is what an LZW bomb would balloon). ``max_pixels`` bounds output BEFORE
    each append; the effective bound also caps at len(data)·4096 (one code
    emits at most a 4096-byte dictionary entry), so a tiny crafted stream
    cannot demand gigabytes no matter what the descriptor claims."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    dict_: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    bound = min(max_pixels, len(data) * 4096)
    out = bytearray()
    prev: bytes | None = None
    acc = npos = 0
    for byte in data:
        acc |= byte << npos
        npos += 8
        while npos >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            npos -= code_size
            if code == clear:
                dict_ = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = dict_[code]
            elif code < len(dict_):
                entry = dict_[code]
                dict_.append(prev + entry[:1])
            elif code == len(dict_):
                entry = prev + prev[:1]
                dict_.append(entry)
            else:
                raise ValueError("bad LZW code")
            if len(out) + len(entry) > bound:
                raise ValueError("LZW overrun")
            out.extend(entry)
            prev = entry
            if len(dict_) >= (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def decode_gif(content: bytes) -> np.ndarray | None:  # noqa: C901
    """First frame of a GIF87a/89a composited onto the logical-screen
    canvas → (canvas_H, canvas_W, 3) uint8 RGB — same dims ``probe``
    reports (frames can be smaller than the canvas and carry an x/y
    offset; canvas background = the header's background-color palette
    entry). None outside the supported class (no palette, malformed
    stream, frame beyond the canvas or the pixel ceiling)."""
    meta = gif_meta(content)
    if meta is None:
        return None
    cw, ch = meta["width"], meta["height"]
    if cw * ch > _GIF_MAX_PIXELS or cw == 0 or ch == 0:
        return None
    try:
        flags = content[10]
        bg_index = content[11]
        pos = 13
        global_pal = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            global_pal = np.frombuffer(
                content[pos:pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        while pos < len(content):
            b = content[pos]
            if b == 0x21:  # extension: label + sub-blocks
                pos += 2
                while content[pos] != 0:
                    pos += 1 + content[pos]
                pos += 1
            elif b == 0x2C:  # image descriptor
                x0, y0, iw, ih = struct.unpack("<HHHH", content[pos + 1:pos + 9])
                iflags = content[pos + 9]
                pos += 10
                pal = global_pal
                if iflags & 0x80:
                    n = 2 << (iflags & 0x07)
                    pal = np.frombuffer(
                        content[pos:pos + 3 * n], dtype=np.uint8
                    ).reshape(n, 3)
                    pos += 3 * n
                if pal is None:
                    return None
                if iw == 0 or ih == 0 or x0 + iw > cw or y0 + ih > ch:
                    return None
                if iw * ih > _GIF_MAX_PIXELS:
                    return None
                min_code = content[pos]
                pos += 1
                chunks = []
                while content[pos] != 0:
                    ln = content[pos]
                    chunks.append(content[pos + 1:pos + 1 + ln])
                    pos += 1 + ln
                idx = _gif_lzw_decode(min_code, b"".join(chunks), iw * ih)
                if len(idx) < iw * ih:
                    return None
                ix = np.frombuffer(
                    bytes(idx[:iw * ih]), dtype=np.uint8
                ).astype(np.int64)
                if ix.max(initial=0) >= len(pal):
                    return None
                img = pal[ix].reshape(ih, iw, 3)
                if iflags & 0x40:  # interlaced: rows in 4-pass order
                    order = np.concatenate([
                        np.arange(0, ih, 8), np.arange(4, ih, 8),
                        np.arange(2, ih, 4), np.arange(1, ih, 2),
                    ])
                    deinter = np.empty_like(img)
                    deinter[order] = img
                    img = deinter
                # composite onto the canvas so pixel dims == probe dims
                if (x0, y0, iw, ih) == (0, 0, cw, ch):
                    return img
                bg = (
                    global_pal[bg_index]
                    if global_pal is not None and bg_index < len(global_pal)
                    else np.zeros(3, dtype=np.uint8)
                )
                canvas = np.tile(bg.astype(np.uint8), (ch, cw, 1))
                canvas[y0:y0 + ih, x0:x0 + iw] = img
                return canvas
            elif b == 0x3B:  # trailer
                return None
            else:
                return None
    except (IndexError, ValueError, struct.error):
        return None
    return None


def _gif_lzw_encode(min_code_size: int, indices) -> bytes:
    """Real greedy LZW compression (dictionary growth, width increments,
    CLEAR reset at 4096 entries) — so fixtures drive every decoder path a
    real-world GIF does, including the kwkwk (code == len(dict)) case."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = npos = 0
    stream = bytearray()
    code_size = min_code_size + 1

    def put(code: int) -> None:
        nonlocal acc, npos
        acc |= code << npos
        npos += code_size
        while npos >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            npos -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    put(clear)
    w = b""
    for px in indices:
        c = bytes([int(px)])
        if w + c in table:
            w += c
            continue
        put(table[w])
        # the decoder adds its mirror entry BEFORE reading the next code —
        # grow our width at the same boundary or the streams desync
        if next_code < 4096:
            table[w + c] = next_code
            next_code += 1
            if next_code > (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = c
    if w:
        put(table[w])
    put(eoi)
    if npos:
        stream.append(acc & 0xFF)
    return bytes(stream)


def encode_gif(img: np.ndarray) -> bytes:
    """Single-frame GIF89a for an (H, W, 3) uint8 image with ≤128 distinct
    colors (fixture generator): global palette + REAL greedy-LZW
    compression (_gif_lzw_encode)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    pal, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 128:
        raise ValueError("fixture encoder supports ≤128 distinct colors")
    # palette size = power of two ≥ max(len(pal), 4)
    bits = max(2, int(np.ceil(np.log2(max(len(pal), 2)))))
    n = 1 << bits
    pal_full = np.zeros((n, 3), dtype=np.uint8)
    pal_full[:len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size, bg, aspect
    out += pal_full.tobytes()
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code = bits
    stream = _gif_lzw_encode(min_code, inverse)
    out += bytes([min_code])
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out += bytes([len(chunk)]) + bytes(chunk)
    out += b"\x00\x3B"
    return bytes(out)


# --- TIFF (uncompressed baseline class) --------------------------------------
# Real stdlib+numpy TIFF: II/MM byte orders, first IFD, 8-bit grayscale /
# RGB with Compression=1 (none), strip assembly. LZW/JPEG-in-TIFF and
# planar configs parse to tiff_meta (decodable=False) but probe() reports
# None for them so decode_media takes the honest ok_stub path.

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _tiff_ifd(content: bytes):
    """(byteorder, {tag: (type, values)}) for the first IFD, or None."""
    if content[:4] == b"II*\x00":
        bo = "<"
    elif content[:4] == b"MM\x00*":
        bo = ">"
    else:
        return None
    (ifd_off,) = struct.unpack(bo + "I", content[4:8])
    if ifd_off + 2 > len(content):
        return None
    (n,) = struct.unpack(bo + "H", content[ifd_off:ifd_off + 2])
    tags = {}
    for i in range(n):
        e = content[ifd_off + 2 + 12 * i:ifd_off + 14 + 12 * i]
        if len(e) < 12:
            return None
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * cnt
        raw = e[8:12] if total <= 4 else content[
            struct.unpack(bo + "I", e[8:12])[0]:][:total]
        if len(raw) < total:
            return None
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}.get(typ)
        if typ == 5:  # RATIONAL
            vals = tuple(struct.unpack(bo + "II", raw[j:j + 8])
                         for j in range(0, total, 8))
        else:
            vals = struct.unpack(bo + fmt * cnt, raw[:total])
        tags[tag] = (typ, vals)
    return bo, tags


def tiff_meta(content: bytes) -> dict | None:
    parsed = _tiff_ifd(content)
    if parsed is None:
        return None
    _, tags = parsed
    if 256 not in tags or 257 not in tags:
        return None

    def tag1(t, default=None):
        return int(tags[t][1][0]) if t in tags else default

    spp = tag1(277, 1)
    bits = tags.get(258, (3, (8,) * spp))[1]
    w, h = int(tags[256][1][0]), int(tags[257][1][0])
    # strip layout must be complete AND hold enough bytes — a truncated or
    # tag-mismatched strip table parses to dims but decode_tiff returns
    # None, and 'decodable' must mirror that (status honesty)
    offs = tags.get(273, (None, ()))[1]
    cnts = tags.get(279, (None, ()))[1]
    available = sum(
        max(0, min(int(o) + int(c), len(content)) - min(int(o), len(content)))
        for o, c in zip(offs, cnts)
    )
    strips_ok = (
        273 in tags and 279 in tags and len(offs) == len(cnts)
        and available >= w * h * spp
    )
    return {
        "width": w,
        "height": h,
        "compression": tag1(259, 1),
        # the class decode_tiff can actually decode (header-level mirror of
        # ALL its checks): uncompressed, chunky, 8-bit, gray or RGB, nonzero
        # dims, complete strip data
        "decodable": (
            w > 0 and h > 0
            and tag1(259, 1) == 1 and tag1(284, 1) == 1
            and spp in (1, 3) and all(b == 8 for b in bits)
            and strips_ok
        ),
    }


def decode_tiff(content: bytes) -> np.ndarray | None:
    """Uncompressed 8-bit gray/RGB chunky TIFF → (H, W, C) uint8, or None
    outside that class (compressed, planar, tiled, non-8-bit)."""
    parsed = _tiff_ifd(content)
    if parsed is None:
        return None
    _, tags = parsed

    def tag1(t, default=None):
        return int(tags[t][1][0]) if t in tags else default

    w, h = tag1(256), tag1(257)
    if not w or not h or w * h > _GIF_MAX_PIXELS:
        return None
    if tag1(259, 1) != 1 or tag1(284, 1) != 1:  # compression / planar
        return None
    spp = tag1(277, 1)
    bits = tags.get(258, (3, (8,) * spp))[1]
    if spp not in (1, 3) or any(b != 8 for b in bits):
        return None
    if 273 not in tags or 279 not in tags:
        return None
    offsets = tags[273][1]
    counts = tags[279][1]
    if len(offsets) != len(counts):
        return None
    data = b"".join(
        content[o:o + c] for o, c in zip(offsets, counts)
    )
    need = w * h * spp
    if len(data) < need:
        return None
    return np.frombuffer(data[:need], dtype=np.uint8).reshape(h, w, spp).copy()


def encode_tiff(img: np.ndarray) -> bytes:
    """Minimal single-strip little-endian uncompressed TIFF for (H, W) gray
    or (H, W, 3) RGB uint8 (fixture generator, byte-stable)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else 3
    pix = img.tobytes()
    # layout: header(8) | pixel data | BitsPerSample array (rgb) | IFD
    data_off = 8
    bps_off = data_off + len(pix)
    ifd_off = bps_off + (6 if not gray else 0)
    entries = []

    def entry(tag, typ, cnt, val):
        entries.append(struct.pack("<HHII", tag, typ, cnt, val))

    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    if gray:
        entry(258, 3, 1, 8)
    else:
        entry(258, 3, 3, bps_off)
    entry(259, 3, 1, 1)                      # no compression
    entry(262, 3, 1, 1 if gray else 2)       # BlackIsZero / RGB
    entry(273, 4, 1, data_off)               # one strip
    entry(277, 3, 1, spp)
    entry(278, 4, 1, h)
    entry(279, 4, 1, len(pix))
    entry(284, 3, 1, 1)                      # chunky
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += pix
    if not gray:
        out += struct.pack("<HHH", 8, 8, 8)
    out += struct.pack("<H", len(entries)) + b"".join(entries)
    out += struct.pack("<I", 0)              # next-IFD terminator
    return bytes(out)
