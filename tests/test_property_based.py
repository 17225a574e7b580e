"""Property-based tests (hypothesis) for the pure-Python kernels whose
invariants the distributed plans rely on."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledge_graph_rag_spark.functions.text import chunk_text
from knowledge_graph_rag_spark.operators.extract import _extract_from_text
from knowledge_graph_rag_spark import oracle, synth


@given(st.text(min_size=0, max_size=3000), st.integers(100, 500))
@settings(max_examples=60, deadline=None)
def test_chunk_text_invariants(text, chunk_size):
    chunks = chunk_text(text, chunk_size=chunk_size, overlap=chunk_size // 5)
    # every chunk within size; non-empty for non-empty input
    assert all(len(c) <= chunk_size for c in chunks)
    if text:
        assert chunks
        # coverage: first chunk starts the text, last chunk ends it
        assert text.startswith(chunks[0])
        assert text.endswith(chunks[-1][-min(len(chunks[-1]), 10):])
        # progress: total material ≥ original (overlap only adds)
        assert sum(len(c) for c in chunks) >= len(text)
    else:
        assert chunks == [""]


@given(st.integers(0, 5000))
@settings(max_examples=40, deadline=None)
def test_gen_doc_deterministic_and_valid(i):
    d1, d2 = synth.gen_doc(i), synth.gen_doc(i)
    assert d1 == d2  # pure function of index
    offsets = [s["offset"] for s in d1["spans"]]
    assert offsets == sorted(offsets) and len(set(offsets)) == len(offsets)
    for s in d1["spans"]:
        if s["kind"] == "text":
            assert s["text"] and s["media_ref"] == ""
        else:
            assert s["text"] == "" and s["media_ref"].startswith("m://")


@given(st.integers(0, 2000))
@settings(max_examples=25, deadline=None)
def test_extract_agrees_with_oracle_per_doc(i):
    """The vectorized extractor's per-text kernel and the independent oracle
    implementation agree on every synthesizable document."""
    doc = synth.gen_doc(i)
    spark_mentions = set()
    for s in doc["spans"]:
        ms, _ = _extract_from_text(s["text"])
        for surf, _idx in ms:
            spark_mentions.add(surf)
    oracle_mentions, _ = oracle.extract_doc(doc)
    # oracle returns canonical (label, type); map spark surfaces through alias
    from knowledge_graph_rag_spark.gazetteer import surface_to_entity

    alias = surface_to_entity()
    assert {alias[s] for s in spark_mentions} == oracle_mentions


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=400))
@settings(max_examples=60, deadline=None)
def test_extract_never_crashes_on_arbitrary_text(text):
    mentions, triples = _extract_from_text(text)
    for surf, idx in mentions:
        assert surf in text or re.sub(r"\s+", " ", surf) not in ("",)
    for s, p, o, _ in triples:
        assert p.isupper()


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=1, max_size=40),
       st.sampled_from(["InternalIP", "Port", "Protocol", "Device", "Person"]))
@settings(max_examples=40, deadline=None)
def test_normalize_key_stable(label, etype):
    """normalize_key (as SQL expr) is deterministic and type-prefixed; checked
    via a one-row DataFrame per example batch is too slow, so evaluate the
    equivalent python semantics mirror used by the merge tests."""
    import re as _re

    def py_normalize(label, t):
        label = label.strip()
        if t in ("InternalIP", "ExternalIP", "IPAddress"):
            return f"ip:{label}"
        if t == "Port":
            m = _re.search(r"\d+", label)
            return f"port:{m.group()}" if m else f"port:{label.lower()}"
        if t == "Protocol":
            return f"protocol:{label.upper()}"
        if t == "Device":
            n = label.lower().replace("workstation", "").replace("server", "").strip()
            return f"device:{n}"
        return f"{t.lower()}:{label.lower()}"

    k1, k2 = py_normalize(label, etype), py_normalize(label, etype)
    assert k1 == k2
    assert k1.split(":", 1)[0] in ("ip", "port", "protocol", "device", etype.lower())


@given(st.text(min_size=0, max_size=2000))
@settings(max_examples=60, deadline=None)
def test_winnow_never_crashes_and_is_deterministic(text):
    from knowledge_graph_rag_spark.operators.fingerprint import winnow

    a, b = winnow(text), winnow(text)
    assert a == b
    assert all(isinstance(x, int) and 0 <= x < (1 << 31) - 1 for x in a)
    if len(text) < 8:
        assert a == []


@given(st.text(min_size=60, max_size=400), st.text(min_size=0, max_size=40))
@settings(max_examples=40, deadline=None)
def test_winnow_shift_robust(body, prefix):
    """Prepending text preserves most fingerprints of a long-enough body —
    the rolling-hash property whole-document md5 lacks."""
    from knowledge_graph_rag_spark.operators.fingerprint import winnow

    base = set(winnow(body))
    if len(base) < 10:
        return  # degenerate (e.g. single repeated char) — no overlap claim
    shifted = set(winnow(prefix + " " + body))
    assert len(base & shifted) / len(base) > 0.5


@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
             min_size=0, max_size=200),
    st.floats(min_value=0.01, max_value=0.9),
)
@settings(max_examples=60, deadline=None)
def test_ewma_update_invariants(values, alpha):
    from knowledge_graph_rag_spark.streaming.stateful import ewma_update

    rows, mean, var, n = ewma_update(values, 0.0, 0.0, 0, alpha, 3.0, 5)
    assert n == len(values) and len(rows) == len(values)
    assert var >= 0.0
    # never flags during warmup
    assert not any(flagged for (_, _, flagged) in rows[:5])
    # incremental application equals one-shot application (state composes)
    if len(values) > 3:
        k = len(values) // 2
        r1, m1, v1, n1 = ewma_update(values[:k], 0.0, 0.0, 0, alpha, 3.0, 5)
        r2, m2, v2, n2 = ewma_update(values[k:], m1, v1, n1, alpha, 3.0, 5)
        assert r1 + r2 == rows and (m2, v2, n2) == (mean, var, n)


@given(
    st.integers(1, 40), st.integers(1, 40),
    st.tuples(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)),
)
@settings(max_examples=40, deadline=None)
def test_media_builders_roundtrip(w, h, rgb):
    """Every synth media builder produces a container its mediacodecs decoder
    inverts exactly (dims + pixel values), for arbitrary sizes/colors."""
    import numpy as np

    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    for build, decode in (
        (synth.minimal_png_bytes, MC.decode_png),
        (synth.minimal_bmp_bytes, MC.decode_bmp),
        (synth.minimal_ppm_bytes, MC.decode_ppm),
        (synth.minimal_gif_bytes, MC.decode_gif),
        (synth.minimal_tiff_bytes, MC.decode_tiff),
    ):
        blob = build(w, h, rgb)
        arr = decode(blob)
        assert arr is not None and arr.shape == (h, w, 3)
        assert (arr == np.array(rgb, dtype=np.uint8)).all()
        meta = MC.probe(blob)
        assert meta["width"] == w and meta["height"] == h


@given(st.integers(1, 5000), st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=30, deadline=None)
def test_wav_builder_roundtrip(duration_ms, rate):
    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    blob = synth.minimal_wav_bytes(duration_ms, sample_rate=rate)
    meta = MC.wav_meta(blob)
    # duration reconstructed from frames/rate — exact up to frame rounding
    frames = (duration_ms * rate) // 1000
    assert meta["sample_rate"] == rate and meta["n_frames"] == frames
    assert abs(meta["duration_ms"] - duration_ms) <= max(1, 1000 // rate + 1)
    samples = MC.decode_wav(blob)
    assert samples.shape == (frames, 1)


@given(
    st.integers(1, 40), st.integers(1, 40),
    st.sampled_from(["444", "422", "420"]),
    st.integers(0, 4),
    st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_roundtrip_property(w, h, subsample, restart, gray):
    """Baseline-JPEG encode→decode inverts shape exactly and pixels within
    DCT-quantization tolerance, across sampling layouts, restart intervals,
    grayscale/RGB, and non-multiple-of-MCU dims."""
    import numpy as np

    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    # bounded-slope ramp (≤7/px, saturating): a % 256 wrap or a full-range
    # ramp squeezed into tiny dims puts a hard seam in the chroma planes,
    # and box-filter + nearest-upsample error at a seam is legitimately
    # large — that's JPEG, not a decoder bug
    g = (np.add.outer(np.arange(h), np.arange(w)) * 7).clip(0, 255).astype(
        np.uint8
    )
    img = g if gray else np.stack([g, 255 - g, g // 2], axis=-1)
    blob = MC.encode_jpeg(img, quality=92, subsample="444" if gray else subsample,
                          restart_interval=restart)
    meta = MC.jpeg_meta(blob)
    assert meta["width"] == w and meta["height"] == h
    assert not meta["progressive"]
    dec = MC.decode_jpeg(blob)
    assert dec is not None and dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    # measured worst cases over a size sweep incl. 1-2px dims:
    # 444→6, gray→3, 422→11, 420→22 (means ≤ 4.4) — 2× margin
    tol = 12 if subsample == "444" or gray else 44
    assert err.max() <= tol and err.mean() <= (4 if gray else 9)


@given(st.integers(1, 60), st.integers(1, 60))
@settings(max_examples=25, deadline=None)
def test_jpeg_decoder_rejects_outside_class(w, h):
    """Progressive-marked and truncated JPEGs must return None (ok_stub
    path), never crash; jpeg_meta still reports dims for progressive."""
    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    blob = bytearray(synth.minimal_jpeg_bytes(w, h))
    i = blob.find(b"\xFF\xC0")
    blob[i + 1] = 0xC2  # mark progressive
    assert MC.decode_jpeg(bytes(blob)) is None
    meta = MC.jpeg_meta(bytes(blob))
    assert meta["progressive"] and meta["width"] == w
    assert MC.decode_jpeg(bytes(blob[: max(4, len(blob) // 3)])) is None


def test_jpeg_decoder_fuzz_never_raises():
    """Pixels-or-None contract under random byte corruption (seeded): the
    decoder must never propagate an exception — a poisoned object in a
    10^12-row decode job must land in decode_status, not kill the task.
    Also bounds worst-case time: the bit reader is linear (masked buf), DC
    categories are capped, so no corrupt stream can wedge a task."""
    import random

    import numpy as np

    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    g = (np.add.outer(np.arange(16), np.arange(16)) % 256).astype(np.uint8)
    base = MC.encode_jpeg(g)
    random.seed(7)
    for _ in range(300):
        bb = bytearray(base)
        for _ in range(random.randint(1, 5)):
            bb[random.randrange(2, len(bb) - 2)] = random.randrange(256)
        out = MC.decode_jpeg(bytes(bb))
        assert out is None or isinstance(out, np.ndarray)
    assert np.abs(MC.decode_jpeg(base).astype(int) - g.astype(int)).max() <= 3


def test_jpeg_pixel_ceiling_bomb():
    """A crafted SOF0 claiming 65535×65535 must be rejected FAST by the
    pixel ceiling (same _GIF_MAX_PIXELS budget as GIF/TIFF) — without it the
    decoder would allocate ~34 GB of float64 planes and run ~268M MCU loop
    iterations before any entropy-stream check. probe() must refuse too, so
    decode_media never labels the row 'ok'."""
    import struct
    import time

    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    blob = bytearray(synth.minimal_jpeg_bytes(8, 8))
    i = blob.find(b"\xFF\xC0")
    blob[i + 5:i + 9] = struct.pack(">HH", 65535, 65535)  # h, w
    t0 = time.time()
    assert MC.decode_jpeg(bytes(blob)) is None
    assert time.time() - t0 < 2.0
    assert MC.probe(bytes(blob)) is None


def test_tiff_probe_honest_about_decodable_class():
    """probe() reports TIFF metadata only for decode_tiff's supported class:
    an LZW-compressed TIFF (IFD parses, dims known, pixels undecodable) must
    probe as None so the row takes the honest ok_stub path instead of an
    'ok' status whose resize silently falls back to the byte-fold."""
    import struct

    import numpy as np

    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    img = (np.add.outer(np.arange(6), np.arange(9)) % 256).astype(np.uint8)
    blob = bytearray(MC.encode_tiff(img))
    assert MC.probe(bytes(blob)) == {"format": "tiff", "width": 9, "height": 6}

    # patch the Compression entry (tag 259, SHORT, 1) from 1 → 5 (LZW)
    ent = struct.pack("<HHII", 259, 3, 1, 1)
    i = blob.find(ent)
    assert i > 0
    blob[i:i + 12] = struct.pack("<HHII", 259, 3, 1, 5)
    meta = MC.tiff_meta(bytes(blob))
    assert meta["width"] == 9 and meta["compression"] == 5
    assert not meta["decodable"]
    assert MC.decode_tiff(bytes(blob)) is None
    assert MC.probe(bytes(blob)) is None


def test_png_pixel_ceiling_and_bounded_inflate():
    """PNG joins the shared decompression-bomb defense: (a) IHDR claiming
    65500×65500 is refused before any inflate; (b) a zlib bomb behind SMALL
    claimed dims is capped at the expected raw size (decompressobj
    max_length) instead of materializing gigabytes; (c) corrupt zlib
    returns None (pixels-or-None), never raises; probe() refuses the bomb
    and zero-dim claims too."""
    import struct
    import time
    import zlib

    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    base = bytearray(synth.minimal_png_bytes(8, 8, (10, 20, 30)))
    bomb = bytearray(base)
    bomb[16:24] = struct.pack(">II", 65500, 65500)
    t0 = time.time()
    assert MC.decode_png(bytes(bomb)) is None
    assert time.time() - t0 < 2.0
    assert MC.probe(bytes(bomb)) is None

    zero = bytearray(base)
    zero[16:24] = struct.pack(">II", 0, 8)
    assert MC.decode_png(bytes(zero)) is None
    assert MC.probe(bytes(zero)) is None

    # zlib bomb: 64 MB of zeros compresses to ~64 KB; claimed dims 8×8
    payload = zlib.compress(b"\x00" * (64 << 20), 9)
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)
    out += struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr))
    out += struct.pack(">I", len(payload)) + b"IDAT" + payload + struct.pack(
        ">I", zlib.crc32(b"IDAT" + payload))
    out += struct.pack(">I", 0) + b"IEND" + struct.pack(
        ">I", zlib.crc32(b"IEND"))
    t0 = time.time()
    assert MC.decode_png(bytes(out)) is None  # size mismatch, capped inflate
    assert time.time() - t0 < 2.0

    corrupt = bytearray(base)
    i = bytes(corrupt).find(b"IDAT") + 6
    corrupt[i] ^= 0xFF
    assert MC.decode_png(bytes(corrupt)) is None  # zlib.error → None

    # the real fixture still decodes
    assert MC.decode_png(bytes(base)).shape == (8, 8, 3)


def test_tiff_decodable_mirrors_strip_checks():
    """tiff_meta['decodable'] must mirror decode_tiff's STRIP checks too: a
    truncated strip table or insufficient strip bytes → decodable=False and
    probe None (else decode_media labels an undecodable row 'ok')."""
    import struct

    import numpy as np

    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    img = (np.add.outer(np.arange(5), np.arange(7)) % 256).astype(np.uint8)
    blob = bytes(MC.encode_tiff(img))
    assert MC.tiff_meta(blob)["decodable"]

    # truncate the pixel data (strips point past EOF): still parses to dims
    cut = blob[: 8 + (5 * 7) // 2] + blob[8 + 5 * 7:]
    if MC.tiff_meta(cut) is not None:  # IFD survived the cut
        assert not MC.tiff_meta(cut)["decodable"]
        assert MC.decode_tiff(cut) is None
        assert MC.probe(cut) is None

    # drop StripByteCounts (tag 279): dims known, pixels unrecoverable
    ent = struct.pack("<HHII", 279, 4, 1, 5 * 7)
    i = blob.find(ent)
    assert i > 0
    # overwrite with a harmless duplicate of Orientation-like short tag id
    patched = bytearray(blob)
    patched[i:i + 2] = struct.pack("<H", 0xFFFE)
    meta = MC.tiff_meta(bytes(patched))
    assert meta is not None and not meta["decodable"]
    assert MC.decode_tiff(bytes(patched)) is None
    assert MC.probe(bytes(patched)) is None


def test_zero_dim_image_probe_refused():
    """A GIF whose screen descriptor claims width=0 probes None (the
    decoder refuses zero dims, so probe must not report an 'ok' row)."""
    import struct

    import numpy as np

    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    rng = np.random.default_rng(2)
    pal = np.unique(rng.integers(0, 256, (8, 3), dtype=np.uint8), axis=0)
    blob = bytearray(MC.encode_gif(pal[rng.integers(0, len(pal), (4, 4))]))
    blob[6:10] = struct.pack("<HH", 0, 4)
    assert MC.decode_gif(bytes(blob)) is None
    assert MC.probe(bytes(blob)) is None


def test_simhash_long_token_bounded():
    """One degenerate 'token' (base64 blob / unsegmented doc) must not
    inflate the vectorized FNV's padded matrix for the whole batch — long
    tokens take the scalar path, bit-identically."""
    import time

    import pandas as pd

    from knowledge_graph_rag_spark.operators import dedup as DD

    def fnv_ref(tok):
        h = 0xCBF29CE484222325
        for ch in tok.encode("utf-8"):
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    toks = ["short", "x" * 63, "y" * 64, "z" * 65, "B" * 5000, "café"]
    assert list(DD._fnv1a_batch(toks)) == [fnv_ref(t) for t in toks]

    texts = pd.Series(["normal words here"] * 2000 + ["A" * 200000])
    t0 = time.time()
    out = DD.simhash64.func(texts)
    assert len(out) == 2001 and time.time() - t0 < 5  # was ~12 s / 8 GB


@given(st.integers(1, 24), st.integers(1, 24), st.integers(2, 100),
       st.booleans())
@settings(max_examples=25, deadline=None)
def test_gif_roundtrip_property(w, h, colors, interlace_noise):
    """GIF encode→decode is pixel-exact for any paletted image (LZW is
    lossless); corrupting a random byte never raises (pixels-or-None)."""
    import random

    import numpy as np

    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    rng = np.random.default_rng(w * 1000 + h * 10 + colors)
    pal = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, colors, (h, w))]
    blob = MC.encode_gif(img)
    assert MC.sniff(blob) == "gif"
    meta = MC.probe(blob)
    assert meta == {"format": "gif", "width": w, "height": h}
    dec = MC.decode_gif(blob)
    assert dec is not None and (dec == img).all()
    assert (MC.decode_image_array(blob) == img).all()

    random.seed(w * 31 + h)
    bb = bytearray(blob)
    bb[random.randrange(0, len(bb))] = random.randrange(256)
    out = MC.decode_gif(bytes(bb))
    assert out is None or isinstance(out, np.ndarray)


def test_gif_decoder_hardening():
    """LZW-bomb descriptors are rejected fast (bounded output, pixel
    ceiling) and offset frames composite onto the canvas so pixel dims
    always equal probe dims."""
    import struct
    import time

    import numpy as np

    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    rng = np.random.default_rng(5)
    pal = np.unique(rng.integers(0, 256, (16, 3), dtype=np.uint8), axis=0)
    base = MC.encode_gif(pal[rng.integers(0, len(pal), (8, 8))])

    bomb = bytearray(base)
    bomb[6:10] = struct.pack("<HH", 65535, 65535)
    i = bomb.find(b"\x2C")
    bomb[i + 5:i + 9] = struct.pack("<HH", 65535, 65535)
    t0 = time.time()
    assert MC.decode_gif(bytes(bomb)) is None
    assert time.time() - t0 < 2.0

    small = bytearray(MC.encode_gif(pal[rng.integers(0, len(pal), (4, 6))]))
    small[6:10] = struct.pack("<HH", 12, 10)       # canvas 12×10
    i = small.find(b"\x2C")
    small[i + 1:i + 5] = struct.pack("<HH", 3, 2)  # frame at (3,2)
    dec = MC.decode_gif(bytes(small))
    meta = MC.probe(bytes(small))
    assert dec is not None and dec.shape == (10, 12, 3)
    assert (meta["height"], meta["width"]) == (10, 12)
    # a frame overflowing the canvas is rejected, not mis-placed
    over = bytearray(small)
    over[i + 1:i + 5] = struct.pack("<HH", 10, 8)  # 10+6 > 12
    assert MC.decode_gif(bytes(over)) is None


def test_gif_real_lzw_exercises_dictionary_growth():
    """The fixture encoder is REAL greedy LZW: repetitive content must
    compress well below 1 code/pixel (proving multi-byte dictionary entries
    are emitted and the decoder's growth/kwkwk paths run), and roundtrip
    stays pixel-exact through a >4096-entry dictionary reset."""
    import numpy as np

    from knowledge_graph_rag_spark.functions import mediacodecs as MC

    rng = np.random.default_rng(9)
    pal = np.unique(rng.integers(0, 256, (8, 3), dtype=np.uint8), axis=0)
    img = np.tile(pal[:2][np.array([0, 1, 0, 0, 1])], (200, 40, 1))[:200, :200]
    blob = MC.encode_gif(img)
    assert len(blob) < img.size // 3 // 4  # strongly compressed
    assert (MC.decode_gif(blob) == img).all()

    big = pal[rng.integers(0, len(pal), (120, 120))]  # dict past 4096 → reset
    assert (MC.decode_gif(MC.encode_gif(big)) == big).all()
