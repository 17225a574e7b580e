"""Binary document → text sources (S8 parity).

Reference: ``app/deprecated/document_processor.py:21-294`` — per-upload
PDF/DOCX/DOC/TXT extraction plus URL fetch with HTML text extraction. The
Spark re-expression scans files with the ``binaryFile`` source (distributed,
one row per file, content as a binary column) and dispatches on extension:

- .txt           native ``decode(content, 'UTF-8')`` — zero Python
- .doc           latin-1 decode + printable filter (the reference's own
                 "simplified" path, :267-278) — native regexp, zero Python
- .html/.htm     script/style block removal + tag strip + blank-line collapse
                 as a native regexp chain (the BeautifulSoup pipeline
                 :280-294 re-expressed; attribute-quoted ``>`` is the known
                 approximation)
- .pdf/.docx     Arrow-batched ``mapInPandas``: pypdf/PyPDF2 and docx2txt
                 when installed (:224-265), else STDLIB extractors — DOCX is
                 a zip (``zipfile`` + ``word/document.xml`` tag-walk:
                 ``<w:p>``→paragraph, ``<w:t>`` text, ``<w:tab/>``/``<w:br/>``
                 whitespace), and simple PDFs are FlateDecode streams
                 (``zlib`` + ``Tj``/``TJ``/``'``/``"`` text-operator parse
                 inside ``BT…ET`` blocks). ``decode_status =
                 'decoder_unavailable'`` remains only for genuinely exotic
                 encodings (non-Flate PDF filters, no extractable text ops).

URL ingestion (:103-222) is a manifest-driven fetch: the fetcher is
injectable; the default is a deterministic offline stub (no network in this
sandbox — same policy as multimodal's fetch). Fetched HTML flows through the
same native extraction chain.

``to_interleaved_documents`` adapts extracted text to the north-star
(doc_id, spans) schema so these files feed the standard pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # either pypdf (new) or PyPDF2 (the reference's import)
    import pypdf as _pdf  # noqa: F401

    PDF_SUPPORT = True
except ImportError:
    try:
        import PyPDF2 as _pdf  # noqa: F401

        PDF_SUPPORT = True
    except ImportError:
        PDF_SUPPORT = False

try:
    import docx2txt as _docx  # noqa: F401

    DOCX_SUPPORT = True
except ImportError:
    DOCX_SUPPORT = False

_OUT_COLS = ("doc_id", "source_format", "text", "n_chars", "decode_status")

# --- stdlib codec-free extractors (document_processor.py:103-294 parity) ----

_XML_ENT = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&apos;", "'"), ("&amp;", "&"))  # &amp; LAST (no double-decode)


def docx_bytes_to_text(content: bytes) -> str:
    """DOCX without third-party libs: a .docx IS a zip; text lives in
    ``word/document.xml``. ``<w:p>`` elements become paragraphs (newline),
    ``<w:t>`` runs carry the text, ``<w:tab/>`` / ``<w:br/>`` become
    whitespace (reference capability: document_processor.py:224-265 via
    docx2txt). Raises on anything that isn't a docx zip."""
    import io
    import re
    import zipfile

    with zipfile.ZipFile(io.BytesIO(content)) as z:
        xml = z.read("word/document.xml").decode("utf-8", "replace")
    paras = []
    for p in re.findall(r"<w:p[ >].*?</w:p>|<w:p/>", xml, re.S):
        p = re.sub(r"<w:tab\s*/>", "\t", p)
        p = re.sub(r"<w:br\s*/>", "\n", p)
        runs = re.findall(r"<w:t(?:\s[^>]*)?>(.*?)</w:t>", p, re.S)
        text = "".join(runs)
        for ent, ch in _XML_ENT:
            text = text.replace(ent, ch)
        paras.append(text)
    return "\n".join(paras).strip()


_PDF_ESC = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
            "(": "(", ")": ")", "\\": "\\"}


def _pdf_unescape(s: str) -> str:
    import re

    def sub(m):
        g = m.group(1)
        # only [0-7]{1,3} is octal; per spec, a backslash before any other
        # char (incl. '8'/'9') is simply dropped — int(g, 8) on '8' would
        # raise and poison the whole file's row
        if re.fullmatch(r"[0-7]{1,3}", g):
            return chr(int(g, 8))
        if g == "\n":  # line continuation
            return ""
        return _PDF_ESC.get(g, g)

    return re.sub(r"\\([0-7]{1,3}|\n|.)", sub, s)


def pdf_bytes_to_text(content: bytes) -> str | None:
    """Simple-PDF text extraction without third-party libs: decompress
    FlateDecode content streams with stdlib ``zlib`` (raw streams pass
    through), then collect the text shown by ``Tj`` / ``TJ`` / ``'`` / ``"``
    operators inside ``BT…ET`` blocks. Returns None when no text operator is
    found (exotic encodings → caller emits decoder_unavailable). Covers the
    synthetic-fixture / simple-generator class of PDFs, not CID-keyed or
    encrypted ones."""
    import re
    import zlib

    streams: list[bytes] = []
    for m in re.finditer(rb"stream\r?\n(.*?)endstream", content, re.S):
        raw = m.group(1)
        try:
            streams.append(zlib.decompress(raw))
        except zlib.error:
            streams.append(raw)  # uncompressed content stream
    lines: list[str] = []
    # (str) with PDF escapes; balanced-paren nesting is rare in generated text
    s_lit = r"\(((?:\\.|[^\\()])*)\)"
    for data in streams:
        txt = data.decode("latin-1", "replace")
        for block in re.findall(r"BT(.*?)ET", txt, re.S):
            parts: list[str] = []
            for op in re.finditer(
                rf"{s_lit}\s*(Tj|')"        # show / newline-show
                rf"|\[((?:[^\[\]\\]|\\.)*?)\]\s*TJ"  # array show
                rf"|{s_lit}\s*\""           # word/char-spaced newline-show
                rf"|(T\*|Td|TD)",           # line moves → newline
                block, re.S,
            ):
                if op.group(2) in ("Tj", "'"):
                    if op.group(2) == "'":
                        parts.append("\n")
                    parts.append(_pdf_unescape(op.group(1)))
                elif op.group(3) is not None:
                    for frag in re.findall(s_lit, op.group(3)):
                        parts.append(_pdf_unescape(frag))
                elif op.group(4) is not None:
                    parts.append("\n" + _pdf_unescape(op.group(4)))
                elif op.group(5) is not None and parts:
                    parts.append("\n")
            if parts:
                lines.append("".join(parts))
    return "\n".join(lines).strip() if lines else None


def html_to_text(col):
    """Native-regexp HTML text extraction (document_processor.py:280-294):
    drop script/style subtrees, strip tags, decode the common entities,
    collapse whitespace-only lines."""
    no_blocks = F.regexp_replace(
        col, r"(?is)<(script|style)[^>]*>.*?</(script|style)>", ""
    )
    no_tags = F.regexp_replace(no_blocks, r"(?s)<[^>]+>", "\n")
    # standard entity-decode order: named entities first, &amp; LAST —
    # decoding &amp; first double-decodes escaped text ('&amp;lt;' → '<')
    decoded = no_tags
    for pat, rep in (
        (r"&lt;", "<"), (r"&gt;", ">"), (r"&quot;", "\""),
        (r"&#39;", "'"), (r"&nbsp;", " "),
    ):
        decoded = F.regexp_replace(decoded, pat, rep)
    decoded = F.regexp_replace(decoded, r"&amp;", "&")
    squeezed = F.regexp_replace(decoded, r"[ \t]+", " ")
    collapsed = F.regexp_replace(squeezed, r"\s*\n\s*(\n\s*)*", "\n")
    return F.regexp_replace(collapsed, r"^\s+|\s+$", "")


def _doc_to_text(col):
    """.doc 'basic support' (:267-278): latin-1 decode, keep printables."""
    return F.regexp_replace(
        F.decode(col, "ISO-8859-1"), r"[^\x20-\x7E\n\r\t]+", ""
    )


def _pdf_docx_extract(df: DataFrame) -> DataFrame:
    """Arrow-batched extraction for formats that need a codec library.
    Emits decode_status ok / decoder_unavailable / error:<type> per row —
    a poison-pill file fails its row, not the job."""
    import io

    import pandas as pd

    def extract(batches):
        for pdf_batch in batches:
            texts, statuses = [], []
            for _, row in pdf_batch.iterrows():
                content, fmt = row["content"], row["source_format"]
                try:
                    if fmt == "pdf":
                        if PDF_SUPPORT:
                            reader = _pdf.PdfReader(io.BytesIO(bytes(content)))
                            texts.append(
                                "\n\n".join(p.extract_text() or "" for p in reader.pages)
                            )
                            statuses.append("ok")
                        else:
                            # stdlib zlib + text-operator parse (simple PDFs)
                            t = pdf_bytes_to_text(bytes(content))
                            texts.append(t)
                            statuses.append(
                                "ok" if t is not None else "decoder_unavailable"
                            )
                    else:  # docx
                        if DOCX_SUPPORT:
                            import tempfile

                            with tempfile.NamedTemporaryFile(suffix=".docx") as tf:
                                tf.write(bytes(content))
                                tf.flush()
                                texts.append(_docx.process(tf.name))
                        else:
                            # stdlib zipfile + document.xml tag-walk
                            texts.append(docx_bytes_to_text(bytes(content)))
                        statuses.append("ok")
                except Exception as ex:  # noqa: BLE001 — per-file isolation
                    texts.append(None)
                    statuses.append(f"error:{type(ex).__name__}")
            yield pd.DataFrame(
                {
                    "doc_id": pdf_batch["doc_id"],
                    "source_format": pdf_batch["source_format"],
                    "text": texts,
                    "n_chars": [len(t) if t else 0 for t in texts],
                    "decode_status": statuses,
                }
            )

    return df.mapInPandas(
        extract,
        schema="doc_id string, source_format string, text string, "
        "n_chars long, decode_status string",
    )


def read_document_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed binary scan + per-format text extraction. Returns
    (doc_id, source_format, text, n_chars, decode_status); unsupported
    extensions surface decode_status='unsupported_format' (the reference
    raises ValueError per upload, :47-48 — here it's a row, not a crash)."""
    files = spark.read.format("binaryFile").load(path_glob).select(
        F.col("path").alias("doc_id"),
        F.lower(F.element_at(F.split(F.col("path"), r"\."), -1)).alias(
            "source_format"
        ),
        "content",
    )
    native = files.filter(
        F.col("source_format").isin("txt", "md", "doc", "html", "htm")
    ).select(
        "doc_id",
        "source_format",
        F.when(
            F.col("source_format").isin("txt", "md"), F.decode("content", "UTF-8")
        )
        .when(F.col("source_format") == "doc", _doc_to_text(F.col("content")))
        .otherwise(html_to_text(F.decode("content", "UTF-8")))
        .alias("text"),
    ).select(
        "doc_id",
        "source_format",
        "text",
        F.length("text").cast("long").alias("n_chars"),
        F.lit("ok").alias("decode_status"),
    )
    codec = _pdf_docx_extract(
        files.filter(F.col("source_format").isin("pdf", "docx"))
    )
    unsupported = files.filter(
        ~F.col("source_format").isin("txt", "md", "doc", "html", "htm", "pdf", "docx")
    ).select(
        "doc_id",
        "source_format",
        F.lit(None).cast("string").alias("text"),
        F.lit(0).cast("long").alias("n_chars"),
        F.lit("unsupported_format").alias("decode_status"),
    )
    return native.unionByName(codec).unionByName(unsupported)


def _stub_fetch(url: str) -> str:
    """Deterministic offline stand-in for the reference's requests.get
    (:103-222): content is a pure function of the url."""
    h = sum(url.encode("utf-8")) % 97
    return (
        f"<html><head><style>x{{}}</style></head><body>"
        f"<h1>Document {h}</h1><p>Fetched from {url}.</p>"
        f"<script>var x=1;</script></body></html>"
    )


def read_url_documents(
    spark: SparkSession, urls: list[str] | DataFrame, fetcher=None,
    fetch_partitions: int = 64,
) -> DataFrame:
    """URL manifest → fetched text. ``fetcher(url) -> str`` is injectable
    (production: an HTTP client with the reference's per-class timeout
    strategy, :85-101); default is the deterministic offline stub. The
    manifest is repartitioned so fetch concurrency = partitions, and a
    failing URL poisons its row only (URLFetchError semantics, :66-83)."""
    import pandas as pd

    fetch = fetcher or _stub_fetch
    if not isinstance(urls, DataFrame):
        urls = spark.createDataFrame([(u,) for u in urls], "url string")
    manifest = urls.repartition(fetch_partitions, "url")

    def run(batches):
        for pdf_batch in batches:
            htmls, statuses = [], []
            for u in pdf_batch["url"]:
                try:
                    htmls.append(fetch(u))
                    statuses.append("ok" if fetcher else "ok_stub")
                except Exception as ex:  # noqa: BLE001
                    htmls.append(None)
                    statuses.append(f"error:{type(ex).__name__}")
            yield pd.DataFrame(
                {"url": pdf_batch["url"], "html": htmls, "decode_status": statuses}
            )

    fetched = manifest.mapInPandas(
        run, schema="url string, html string, decode_status string"
    )
    # project the regexp chain ONCE, then derive n_chars from the alias —
    # Catalyst does not reliably CSE a 9-deep regexp_replace chain, so
    # inlining html_to_text twice would run every regex twice per row
    return fetched.select(
        F.col("url").alias("doc_id"),
        F.lit("url").alias("source_format"),
        html_to_text(F.col("html")).alias("text"),
        "decode_status",
    ).withColumn("n_chars", F.length("text").cast("long")).select(
        "doc_id", "source_format", "text", "n_chars", "decode_status"
    )


def to_interleaved_documents(extracted: DataFrame) -> DataFrame:
    """Adapt (doc_id, text, …) rows to the north-star interleaved schema —
    one text span per document — so file/URL sources feed pipeline.run."""
    return extracted.filter(
        (F.col("decode_status").startswith("ok")) & F.col("text").isNotNull()
    ).select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
