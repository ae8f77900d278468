"""Generator for ``cc_sample.warc.gz`` — a Common-Crawl-layout WARC fixture.

PROVENANCE: this container has no network access, so a genuine Common-Crawl
segment cannot be fetched; this fixture is hand-constructed to reproduce the
real CC container layout and the page-level constructs a crawl actually
serves, so the WARC -> extract path is exercised beyond what the synthetic
corpus generators can invent:

container layout (as in real CC .warc.gz):
  - one gzip MEMBER per record, members concatenated
  - leading ``warcinfo`` record, ``request`` records interleaved with
    ``response`` records (the parser must skip non-responses)
  - HTTP response envelopes with realistic status lines and headers

page-level constructs:
  - ISO-8859-1 page with declared meta charset and 8-bit accented bytes
  - windows-1252 page with curly quotes/em-dash in the 0x80-0x9F range
  - UTF-8 page with BOM, CJK text and an emoji
  - tag soup: unclosed <p>, misnested <b><i>, stray close tags
  - raw-text traps: "</div>" inside a <script> string, CSS in <style>
  - HTML entities (&eacute; &amp; &#8217; &nbsp;) in body text
  - a real ``application/pdf`` response whose PDF uses a ROTATED text
    matrix and octal string escapes (the spec/pdfx long-tail paths)
  - a truncated binary response and an empty-body response (error rows)

transfer encodings (the highest-frequency real-CC constructs):
  - ``Transfer-Encoding: chunked`` body (chunk extension + trailer header)
  - ``Content-Encoding: gzip`` body (member mtime pinned to 0)
  - chunked-wrapping-gzip (de-chunk must happen BEFORE gunzip)
  - a gzip BODY truncated mid-member (best-effort prefix, bounded row)
  - ``Content-Encoding: deflate`` in BOTH wire variants: zlib-wrapped
    (the RFC meaning) and raw deflate (what many origin servers send
    under the same token)
  - ``Content-Encoding: br``: brotli has no stdlib codec in this
    container, so the PAYLOAD here is a deterministic stand-in byte
    string (not a real brotli stream — honestly labeled); the reader
    must emit the bounded unsupported-coding marker, never pass the
    compressed bytes through as html
  - a final archive MEMBER truncated mid-stream (interrupted fetch: all
    prior records survive, the tail is lost/partial, never an exception)

Deterministic: fixed texts, fixed timestamps, gzip mtime=0 — re-running
this script reproduces the committed fixture byte-for-byte
(tests/test_warc.py pins its sha256).

Run:  python tests/fixtures/make_cc_sample.py
"""

from __future__ import annotations

import gzip
import io
import pathlib
import zlib

CRLF = b"\r\n"
OUT = pathlib.Path(__file__).parent / "cc_sample.warc.gz"


def _record(rtype: bytes, url: bytes | None, ts: bytes, payload: bytes) -> bytes:
    head = [b"WARC/1.0", b"WARC-Type: " + rtype, b"WARC-Date: " + ts]
    if url is not None:
        head.append(b"WARC-Target-URI: " + url)
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return CRLF.join(head) + CRLF + CRLF + payload + CRLF + CRLF


def _response(url: bytes, ts: bytes, body: bytes, ctype: bytes = b"text/html") -> bytes:
    http = (
        b"HTTP/1.1 200 OK" + CRLF
        + b"Content-Type: " + ctype + CRLF
        + b"Server: Apache/2.4.41 (Ubuntu)" + CRLF
        + b"Content-Length: " + str(len(body)).encode() + CRLF
        + CRLF
        + body
    )
    return _record(b"response", url, ts, http)


def _gz_bytes(body: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(body)
    return buf.getvalue()


def _chunk(body: bytes, sizes: tuple[int, ...]) -> bytes:
    """HTTP/1.1 chunked transfer coding of ``body`` with given chunk sizes
    (last chunk takes the remainder), one chunk extension, and a trailer
    header after the 0-chunk — the shapes real origin servers emit."""
    out = bytearray()
    pos = 0
    for k, sz in enumerate(sizes):
        piece = body[pos : pos + sz]
        if not piece:
            break  # sizes overran the body: a 0-size line here would be a
            # premature terminator chunk and silently truncate the page
        ext = b";ext=1" if k == 1 else b""
        out += hex(len(piece))[2:].encode() + ext + CRLF + piece + CRLF
        pos += sz
    rest = body[pos:]
    if rest:
        out += hex(len(rest))[2:].encode() + CRLF + rest + CRLF
    out += b"0" + CRLF + b"X-Trailer: checksum" + CRLF + CRLF
    return bytes(out)


def _enc_response(
    url: bytes,
    ts: bytes,
    payload: bytes,
    extra_headers: list[bytes],
    ctype: bytes = b"text/html",
) -> bytes:
    http = (
        b"HTTP/1.1 200 OK" + CRLF
        + b"Content-Type: " + ctype + CRLF
        + b"Server: nginx/1.18.0" + CRLF
        + CRLF.join(extra_headers) + CRLF
        + CRLF
        + payload
    )
    return _record(b"response", url, ts, http)


def _request(url: bytes, ts: bytes) -> bytes:
    http = (
        b"GET / HTTP/1.1" + CRLF
        + b"Host: " + url.split(b"/")[2] + CRLF
        + b"User-Agent: CCBot/2.0" + CRLF
        + CRLF
    )
    return _record(b"request", url, ts, http)


def _raw_deflate(body: bytes) -> bytes:
    """Raw deflate stream (no zlib wrapper) — the de-facto wire variant."""
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    return c.compress(body) + c.flush()


def _rotated_pdf() -> bytes:
    """One-page PDF: 90-degree-rotated text matrix + octal escapes, flate."""
    content = (
        rb"BT 0 1 -1 0 -760 50 Tm (Rotated \101rchive page with a text layer) Tj ET"
        + b"\n"
        + rb"BT 0 1 -1 0 -746 50 Tm (second rotated line clears the 50-char rule) Tj ET"
    )
    comp = zlib.compress(content)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
    }
    parts = [b"%PDF-1.4\n"]
    for num, body in objs.items():
        parts.append(b"%d 0 obj\n" % num + body + b"\nendobj\n")
    parts.append(b"%%EOF\n")
    return b"".join(parts)


def build_records() -> list[bytes]:
    ts = b"2019-11-07T14:21:33Z"

    latin1_page = (
        """<!DOCTYPE html>
<html><head><meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">
<title>Café français</title></head>
<body><div id="nav"><a href="/">Accueil</a> <a href="/menu">Menu</a></div>
<div id="main"><h1>Le café du coin</h1>
<p>Une institution naïve du quartier, fondée en 1987 par un
pâtissier têtu. Les habitués commandent un café crème
et discutent pendant des heures sans jamais consulter le menu.
<p>Deuxième paragraphe jamais fermé ; le vrai web ne ferme pas ses
balises, et l'extracteur doit quand même segmenter correctement.
<b><i>Gras et italique mal imbriqués</b></i> suivis de texte normal
qui continue la phrase pour atteindre une longueur crédible.</p>
</div></body></html>"""
    ).encode("iso-8859-1")

    cp1252_page = (
        """<html><head><meta charset="windows-1252"><title>Quotes</title></head>
<body><div><p>“Smart quotes” and the reporter’s em-dash
— the 0x80–0x9F range that is NOT latin-1 — survive a
declared windows-1252 decode. This paragraph carries enough prose to be
treated as main content by any density heuristic worth shipping.</p>
<p>A second paragraph keeps the block multi-line and the text ratio high
so boilerplate stripping has something unambiguous to keep.</p>
</div></body></html>"""
    ).encode("cp1252")

    utf8_bom_page = b"\xef\xbb\xbf" + (
        """<html><head><meta charset="utf-8"><title>日本語</title></head>
<body><div><h1>東京ガイド</h1>
<p>東京は世界最大級の都市であり、
食文化と技術の両方で知られています。
Emoji survive too: \U0001f35c and the text keeps flowing with enough
characters to clear the native-text threshold comfortably.</p>
</div></body></html>"""
    ).encode("utf-8")

    script_trap_page = (
        b"""<html><head><title>Trap</title>
<style>div.main { color: #333; } /* </div> inside CSS */</style>
<script>var markup = "</div><p>not content</p>"; if (a < b) { go(); }</script>
</head>
<body><div class="main"><p>Visible article text that the extractor must
keep: raw-text elements swallow fake close tags inside their string
literals, so nothing from the script or style blocks leaks into the
extracted output. This sentence pads the paragraph past the density
threshold used by the classifier.</p>
<p>And a closing paragraph with a stray close tag coming up.</p></div>
</div></body></html>"""
    )

    entities_page = (
        b"""<html><head><title>Entities &amp; friends</title></head>
<body><div><p>The caf&eacute; serves espresso&nbsp;&mdash; it&#8217;s
&quot;the best&quot; &amp; cheapest in town, says the owner&#x2019;s
daughter. Entity-heavy prose is everywhere on the legacy web and the
extractor has to normalize it without corrupting adjacent words.</p>
</div></body></html>"""
    )

    chunked_page = (
        b"""<html><head><title>Chunked</title></head>
<body><div><p>Chunked transfer encoding splits this article across
several size-prefixed chunks; the parser must reassemble the body before
any charset or density logic runs, or the hex size lines leak into the
extracted text. This paragraph is deliberately long enough to span
chunk boundaries mid-word and mid-tag.</p>
<p>A trailer header follows the zero chunk and must be ignored.</p>
</div></body></html>"""
    )

    gzip_page = (
        b"""<html><head><title>Compressed</title></head>
<body><div><p>Content-Encoding gzip is the single most common response
coding a crawler sees; the archived record stores the compressed bytes
verbatim, so the reader has to gunzip the HTTP body before extraction.
This prose keeps the page comfortably above the native-text rule.</p>
<p>Second paragraph so block segmentation has work to do here too.</p>
</div></body></html>"""
    )

    both_page = (
        b"""<html><head><title>Both codings</title></head>
<body><div><p>Transfer coding wraps content coding: this body is gzip
compressed first and THEN chunked, so the reader must de-chunk before
gunzipping; the reverse order corrupts the stream. Enough words follow
to clear every threshold the classifier applies to html pages.</p>
</div></body></html>"""
    )

    deflate_raw_page = (
        b"""<html><head><title>Raw deflate</title></head>
<body><div><p>Many origin servers send Content-Encoding deflate as a RAW
deflate stream with no zlib wrapper, despite what the RFC says; a reader
that only tries the wrapped variant turns these pages into garbage rows.
This paragraph keeps the page well past the native-text threshold.</p>
</div></body></html>"""
    )

    deflate_zlib_page = (
        b"""<html><head><title>Zlib deflate</title></head>
<body><div><p>The RFC-correct deflate variant wraps the stream in a zlib
header and checksum; both wire forms occur in real crawls and both must
inflate to the exact original page bytes before extraction runs.
Padding prose carries this paragraph past every length threshold.</p>
</div></body></html>"""
    )

    cut_gz_page = (
        b"""<html><head><title>Cut</title></head>
<body><div><p>This gzip member is truncated mid-stream by the fixture;
the reader keeps whatever prefix inflates and the extractor turns the
remainder into a bounded error row or partial text, never a task
failure. Padding padding padding padding padding padding padding.</p>
</div></body></html>"""
    )

    records = [
        _record(
            b"warcinfo",
            None,
            b"2019-11-07T14:21:30Z",
            b"software: tests/fixtures/make_cc_sample.py (CC-layout fixture)\r\n"
            b"format: WARC File Format 1.0\r\n",
        ),
        _request(b"https://cafe.example.fr/", ts),
        _response(
            b"https://cafe.example.fr/", ts, latin1_page,
            b"text/html; charset=ISO-8859-1",
        ),
        _request(b"https://news.example.com/quotes", ts),
        _response(b"https://news.example.com/quotes", ts, cp1252_page),
        _response(b"https://tokyo.example.jp/guide", ts, utf8_bom_page),
        _response(b"https://trap.example.com/js", ts, script_trap_page),
        _response(b"https://legacy.example.org/entities", ts, entities_page),
        _response(
            b"https://docs.example.com/rotated.pdf", ts, _rotated_pdf(),
            b"application/pdf",
        ),
        _response(
            b"https://broken.example.net/truncated", ts,
            b"\x00\x01\x02\xff\xfe binary junk that is neither html nor pdf",
            b"application/octet-stream",
        ),
        _response(b"https://empty.example.net/nobody", ts, b""),
        # real-crawl transfer encodings (VERDICT r3 #7)
        _enc_response(
            b"https://transfer.example.com/chunked", ts,
            _chunk(chunked_page, (7, 64, 150)),
            [b"Transfer-Encoding: chunked"],
        ),
        _enc_response(
            b"https://compressed.example.io/gz", ts,
            _gz_bytes(gzip_page),
            [b"Content-Encoding: gzip"],
        ),
        _enc_response(
            b"https://both.example.dev/cg", ts,
            _chunk(_gz_bytes(both_page), (11, 96)),
            [b"Transfer-Encoding: chunked", b"Content-Encoding: gzip"],
        ),
        _enc_response(
            b"https://cut.example.net/gzcut", ts,
            _gz_bytes(cut_gz_page)[: int(len(_gz_bytes(cut_gz_page)) * 0.6)],
            [b"Content-Encoding: gzip"],
        ),
        # deflate content coding, both wire variants (VERDICT r4 #3)
        _enc_response(
            b"https://rawdeflate.example.com/page", ts,
            _raw_deflate(deflate_raw_page),
            [b"Content-Encoding: deflate"],
        ),
        _enc_response(
            b"https://zlibdeflate.example.org/page", ts,
            zlib.compress(deflate_zlib_page, 9),
            [b"Content-Encoding: deflate"],
        ),
        # brotli: payload is a DETERMINISTIC STAND-IN (no brotli codec in
        # this container) — the reader must replace it with the bounded
        # unsupported-coding marker, so these bytes never reach extraction
        _enc_response(
            b"https://modern.example.app/br", ts,
            bytes(range(0x1B, 0x7B)) * 3,
            [b"Content-Encoding: br"],
        ),
    ]
    return records


def truncated_tail_member() -> bytes:
    """A response record whose gzip MEMBER is cut mid-stream — the shape an
    interrupted .warc.gz fetch leaves at end of file.  Appended raw to the
    archive; the reader must keep every complete prior member and at most
    lose/truncate this one (never raise)."""
    ts = b"2019-11-07T14:21:33Z"
    body = (
        b"<html><body><div><p>tail record whose compressed member is cut; "
        b"whatever prefix inflates is all the archive can offer.</p>"
        b"</div></body></html>"
    )
    member = _gz_bytes(_response(b"https://tail.example.org/lost", ts, body))
    return member[: int(len(member) * 0.55)]


def main() -> None:
    buf = io.BytesIO()
    for rec in build_records():
        # one gzip member per record, mtime pinned: deterministic bytes,
        # same member-per-record layout as real Common-Crawl .warc.gz
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
    # interrupted-fetch tail: final member truncated mid-stream
    buf.write(truncated_tail_member())
    OUT.write_bytes(buf.getvalue())
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
