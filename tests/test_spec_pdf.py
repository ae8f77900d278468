"""Unit fixtures for the PDF text-layer extraction spec (pure Python)."""

import zlib

from gonova_document_parser_spark.spec.pdfx import (
    extract_pdf_pages,
    pdf_text_len,
    _unescape_pdf_string,
)


def _pdf(objects: dict[int, bytes]) -> bytes:
    parts = [b"%PDF-1.4\n"]
    for num, body in objects.items():
        parts.append(b"%d 0 obj\n" % num + body + b"\nendobj\n")
    parts.append(b"%%EOF\n")
    return b"".join(parts)


def _doc(contents: list[bytes], compress: set[int] = frozenset()) -> bytes:
    n = len(contents)
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % (3 + k) for k in range(n))
        + b"] /Count %d >>" % n,
    }
    for k, data in enumerate(contents):
        objs[3 + k] = b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>" % (3 + n + k)
        if k in compress:
            comp = zlib.compress(data)
            objs[3 + n + k] = (
                b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(comp)
                + comp
                + b"\nendstream"
            )
        else:
            objs[3 + n + k] = (
                b"<< /Length %d >>\nstream\n" % len(data) + data + b"\nendstream"
            )
    return _pdf(objs)


def test_single_page_lines_and_blocks():
    content = (
        b"BT 1 0 0 1 50 760 Tm (line one) Tj ET\n"
        b"BT 1 0 0 1 50 746 Tm (line two) Tj ET\n"
        b"BT 1 0 0 1 50 700 Tm (new block) Tj ET\n"  # 46 gap > BLOCK_GAP
    )
    pages = extract_pdf_pages(_doc([content]))
    assert len(pages) == 1
    assert pages[0] == [("block", "line one\nline two"), ("block", "new block")]


def test_page_order_follows_kids_not_object_order():
    p1 = b"BT 1 0 0 1 50 700 Tm (page one text) Tj ET"
    p2 = b"BT 1 0 0 1 50 700 Tm (page two text) Tj ET"
    n = 2
    # shuffle object order: content of page 2 appears first in the file
    objs = {
        6: b"<< /Length %d >>\nstream\n" % len(p2) + p2 + b"\nendstream",
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        4: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
        5: b"<< /Length %d >>\nstream\n" % len(p1) + p1 + b"\nendstream",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
    }
    # NOTE: Kids order is [3, 4]; page obj 3 -> contents 6 (p2 bytes)
    pages = extract_pdf_pages(_pdf(objs))
    assert [b[0][1] for b in pages] == ["page two text", "page one text"]


def test_flate_compressed_stream():
    content = b"BT 1 0 0 1 50 700 Tm (compressed payload text) Tj ET"
    pages = extract_pdf_pages(_doc([content], compress={0}))
    assert pages[0][0][1] == "compressed payload text"


def test_two_column_reading_order():
    content = (
        b"BT 1 0 0 1 320 760 Tm (right top) Tj ET\n"
        b"BT 1 0 0 1 50 760 Tm (left top) Tj ET\n"
        b"BT 1 0 0 1 50 746 Tm (left second) Tj ET\n"
        b"BT 1 0 0 1 320 746 Tm (right second) Tj ET\n"
    )
    pages = extract_pdf_pages(_doc([content]))
    # left column fully before right column
    assert pages[0] == [
        ("block", "left top\nleft second"),
        ("block", "right top\nright second"),
    ]


def test_td_tstar_and_tj_array():
    content = (
        b"BT /F1 12 Tf 14 TL 50 760 Td [(part one ) (and two)] TJ T* (next line) Tj ET"
    )
    pages = extract_pdf_pages(_doc([content]))
    assert pages[0][0][1] == "part one and two\nnext line"


def test_string_escapes_and_hex():
    assert _unescape_pdf_string(rb"a\(b\)c \\ \n \101") == b"a(b)c \\ \n A"
    content = b"BT 1 0 0 1 50 700 Tm <48656C6C6F> Tj ET"
    pages = extract_pdf_pages(_doc([content]))
    assert pages[0][0][1] == "Hello"


def test_octal_escapes_in_content_stream():
    content = rb"BT 1 0 0 1 50 700 Tm (octal \101\102\103\040mix) Tj ET"
    pages = extract_pdf_pages(_doc([content]))
    assert pages[0][0][1] == "octal ABC mix"


UPRIGHT_EXPECT = [("block", "line one\nline two"), ("block", "new block")]


def test_rotated_page_90_reads_like_upright():
    """90-degree CCW text matrix: device coords are R(90) of reading coords;
    modal un-rotation restores the upright line/block segmentation."""
    content = (
        b"BT 0 1 -1 0 -760 50 Tm (line one) Tj ET\n"
        b"BT 0 1 -1 0 -746 50 Tm (line two) Tj ET\n"
        b"BT 0 1 -1 0 -700 50 Tm (new block) Tj ET\n"
    )
    assert extract_pdf_pages(_doc([content]))[0] == UPRIGHT_EXPECT


def test_rotated_page_180_reads_like_upright():
    content = (
        b"BT -1 0 0 -1 -50 -760 Tm (line one) Tj ET\n"
        b"BT -1 0 0 -1 -50 -746 Tm (line two) Tj ET\n"
        b"BT -1 0 0 -1 -50 -700 Tm (new block) Tj ET\n"
    )
    assert extract_pdf_pages(_doc([content]))[0] == UPRIGHT_EXPECT


def test_rotated_page_270_reads_like_upright():
    content = (
        b"BT 0 -1 1 0 760 -50 Tm (line one) Tj ET\n"
        b"BT 0 -1 1 0 746 -50 Tm (line two) Tj ET\n"
        b"BT 0 -1 1 0 700 -50 Tm (new block) Tj ET\n"
    )
    assert extract_pdf_pages(_doc([content]))[0] == UPRIGHT_EXPECT


def test_cm_rotation_with_q_restore():
    """Rotation supplied by the CTM (cm under q/Q) instead of Tm: text keeps
    upright coordinates, the CTM rotates the whole page; Td composes under
    the rotated matrix."""
    content = (
        b"q 0 1 -1 0 0 0 cm\n"
        b"BT 1 0 0 1 50 760 Td (line one) Tj ET\n"
        b"BT 1 0 0 1 50 746 Td (line two) Tj ET\n"
        b"BT 1 0 0 1 50 700 Td (new block) Tj ET\n"
        b"Q\n"
    )
    assert extract_pdf_pages(_doc([content]))[0] == UPRIGHT_EXPECT


def test_tstar_advances_under_rotated_tm():
    """T* line advances happen in TEXT space: under a rotated Tm the next
    line still lands one leading below in reading space."""
    content = b"BT 14 TL 0 1 -1 0 -760 50 Tm (line one) Tj T* (line two) Tj ET"
    pages = extract_pdf_pages(_doc([content]))
    assert pages[0][0][1] == "line one\nline two"


def test_objstm_packed_objects_are_unpacked():
    """PDF 1.5+ object streams: the catalog/pages/page objects live inside
    a /ObjStm compressed stream (no obj/endobj wrappers); the content
    stream stays a direct object."""
    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
    }
    bodies, header = [], []
    off = 0
    for num, b in inner.items():
        header.append(b"%d %d" % (num, off))
        bodies.append(b)
        off += len(b) + 1
    head = b" ".join(header) + b"\n"
    payload = head + b"\n".join(bodies) + b"\n"
    comp = zlib.compress(payload)
    content = b"BT 1 0 0 1 50 700 Tm (from an object stream) Tj ET"
    objs = {
        4: b"<< /Type /ObjStm /N 3 /First %d /Filter /FlateDecode /Length %d >>\nstream\n"
        % (len(head), len(comp))
        + comp
        + b"\nendstream",
        5: b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
    }
    pages = extract_pdf_pages(_pdf(objs))
    assert pages[0][0][1] == "from an object stream"


def test_inline_image_binary_is_skipped():
    """BI..EI inline image: the raw binary between ID and EI must not be
    tokenized (it contains bytes that look like ops, parens and numbers)."""
    junk = b"\x00\x89PNG(fake \xff\xfe Tj ET BT 9 9 Td (ghost) Tj"  # hostile
    content = (
        b"BT 1 0 0 1 50 760 Tm (before image) Tj ET\n"
        b"BI /W 4 /H 4 /BPC 8 /CS /RGB ID " + junk + b" EI\n"
        b"BT 1 0 0 1 50 700 Tm (after image) Tj ET\n"
    )
    pages = extract_pdf_pages(_doc([content]))
    texts = [t for _, t in pages[0]]
    assert any("before image" in t for t in texts)
    assert any("after image" in t for t in texts)
    assert not any("ghost" in t for t in texts)


def test_encrypted_pdf_routes_to_scanned():
    """/Encrypt in the trailer: streams are ciphertext, so the text layer
    reports 0 chars and the 50-char rule routes the doc to the OCR path."""
    content = b"BT 1 0 0 1 50 700 Tm (this text would be ciphertext) Tj ET"
    data = _doc([content])
    enc = data.replace(
        b"%%EOF", b"trailer\n<< /Encrypt 9 0 R /Root 1 0 R >>\n%%EOF"
    )
    assert pdf_text_len(enc) == 0
    assert extract_pdf_pages(enc) == []
    from gonova_document_parser_spark.spec import extract_document

    r = extract_document(enc)
    assert r["page_type"] == "scanned" and r["success"] is False
    # unencrypted twin still extracts
    assert pdf_text_len(data) > 0


def test_trailer_decoys_cannot_hide_the_real_encrypted_trailer():
    """Hostile cap-exhaustion probe: >64 decoy 'trailer' keywords AHEAD of
    the genuine encrypted trailer.  Sites scan from the END of the file
    (real trailers are written last), so the _MAX_SITES work bound can't
    be spent on decoys before the authoritative dict is reached."""
    content = b"BT 1 0 0 1 50 700 Tm (would be ciphertext) Tj ET"
    data = _doc([content])
    decoys = b"trailer \n" * 200  # no << >> dict after any of them
    enc = data.replace(
        b"%%EOF",
        decoys + b"trailer\n<< /Encrypt 9 0 R /Root 1 0 R >>\n%%EOF",
    )
    assert pdf_text_len(enc) == 0
    assert extract_pdf_pages(enc) == []


def test_encrypt_mention_in_page_content_is_not_encryption():
    """A benign PDF whose page TEXT mentions '/Encrypt 5 0 R' (e.g. a doc
    about PDF internals) must NOT be misrouted to the OCR path: the
    /Encrypt key is only live in the trailer / XRef-stream dict."""
    content = (
        b"BT 1 0 0 1 50 700 Tm "
        b"(the trailer key /Encrypt 5 0 R marks encrypted files) Tj ET"
    )
    data = _doc([content])
    assert b"/Encrypt 5 0 R" in data  # prose mention, no trailer << >> dict
    assert pdf_text_len(data) > 0
    pages = extract_pdf_pages(data)
    assert "/Encrypt 5 0 R" in pages[0][0][1]


def test_encrypt_in_xref_stream_dict_is_detected():
    """PDF 1.5+ layout: no 'trailer' keyword — the /Encrypt key lives in
    the /Type /XRef stream dictionary and must still route to scanned."""
    content = b"BT 1 0 0 1 50 700 Tm (would be ciphertext) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
        6: b"<< /Type /XRef /Size 7 /Encrypt 5 0 R /W [1 2 1] >>",
    }
    data = _pdf(objs)
    assert b"trailer" not in data
    assert pdf_text_len(data) == 0
    assert extract_pdf_pages(data) == []


def test_objstm_mention_without_type_is_not_unpacked():
    """An object whose content merely CONTAINS the literal '/ObjStm' (with
    a garbage non-integer 'header') must be skipped, not raise ValueError
    and turn the doc into an error row."""
    content = b"BT 1 0 0 1 50 700 Tm (discusses /ObjStm layout) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
        # hostile: mentions /ObjStm, carries /N and /First, but the stream
        # "header" is prose, not integer pairs
        5: b"<< /Filter /Fake >> about /ObjStm /N 2 /First 10 \nstream\nnot an int header\nendstream",
    }
    pages = extract_pdf_pages(_pdf(objs))
    assert pages[0][0][1] == "discusses /ObjStm layout"


def test_objstm_bad_integer_header_is_skipped():
    """A true /Type /ObjStm whose header bytes fail int() parsing is
    skipped gracefully (decl says N pairs but the bytes are junk)."""
    junk = b"12 zero 34 huh\n"  # non-integer tokens in pair positions
    comp = zlib.compress(junk + b"<< /Type /Catalog >>")
    content = b"BT 1 0 0 1 50 700 Tm (direct object text) Tj ET"
    objs = {
        4: b"<< /Type /ObjStm /N 2 /First %d /Filter /FlateDecode >>\nstream\n"
        % len(junk)
        + comp
        + b"\nendstream",
        5: b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
    }
    pages = extract_pdf_pages(_pdf(objs))
    assert pages[0][0][1] == "direct object text"


def test_text_layer_len_threshold():
    short = b"BT 1 0 0 1 50 700 Tm (tiny) Tj ET"
    assert pdf_text_len(_doc([short])) == 4


def test_malformed_pdf_falls_back_gracefully():
    # no catalog/kids: BT-containing streams by object number
    objs = {
        7: b"<< /Length 40 >>\nstream\nBT 1 0 0 1 50 700 Tm (fallback) Tj ET\nendstream",
    }
    pages = extract_pdf_pages(_pdf(objs))
    assert pages[0][0][1] == "fallback"


def _cid_doc(cmap: bytes, content: bytes) -> bytes:
    """One-page PDF with an Identity-H font whose /ToUnicode is ``cmap``."""
    return _pdf(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: (
                b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
                b"/Resources << /Font << /F1 5 0 R >> >> >>"
            ),
            4: b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
            5: (
                b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
                b"/Encoding /Identity-H /ToUnicode 6 0 R >>"
            ),
            6: b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream",
        }
    )


_CMAP = (
    b"/CIDInit /ProcSet findresource begin\n"
    b"begincmap\n"
    b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    b"2 beginbfchar\n<0001> <0048>\n<0002> <0065>\nendbfchar\n"
    b"1 beginbfrange\n<0010> <0012> <006C>\nendbfrange\n"  # 10->l 11->m 12->n
    b"1 beginbfrange\n<0020> <0021> [<00570057> <0021>]\nendbfrange\n"
    b"endcmap\nend\n"
)


def test_tounicode_bfchar_and_bfrange():
    """Identity-H 2-byte codes decode through the ToUnicode CMap: bfchar
    singles, scalar bfrange offsets, and array-destination ranges."""
    # codes: 0001 0002 0010 0011 0012 -> "Helmn"
    content = b"BT /F1 12 Tf 1 0 0 1 50 700 Tm <00010002001000110012> Tj ET"
    pages = extract_pdf_pages(_cid_doc(_CMAP, content))
    assert pages[0][0][1] == "Helmn"


def test_tounicode_array_destination_multichar():
    # code 0020 -> "WW" (two UTF-16BE chars), 0021 -> "!"
    content = b"BT /F1 12 Tf 1 0 0 1 50 700 Tm <00200021> Tj ET"
    pages = extract_pdf_pages(_cid_doc(_CMAP, content))
    assert pages[0][0][1] == "WW!"


def test_tounicode_unmapped_code_is_replacement():
    content = b"BT /F1 12 Tf 1 0 0 1 50 700 Tm <0001FFFE> Tj ET"
    pages = extract_pdf_pages(_cid_doc(_CMAP, content))
    assert pages[0][0][1] == "H�"


def test_tounicode_surrogate_pair_and_text_len():
    cmap = (
        b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"1 beginbfchar\n<0003> <D83DDE00>\nendbfchar\nendcmap\n"
    )
    content = b"BT /F1 12 Tf 1 0 0 1 50 700 Tm <0003> Tj ET"
    doc = _cid_doc(cmap, content)
    assert extract_pdf_pages(doc)[0][0][1] == "\U0001f600"
    assert pdf_text_len(doc) == 1  # one decoded code point


def test_tj_kerning_offsets_become_spaces():
    """Real-world TJ arrays encode word gaps as large negative kerning
    offsets; small offsets are intra-word kerning and emit nothing."""
    content = b"BT 1 0 0 1 50 700 Tm [(Hel) -20 (lo) -250 (world) -500 (x)] TJ ET"
    pages = extract_pdf_pages(_doc([content]))
    assert pages[0][0][1] == "Hello world x"


def test_encrypt_in_xref_dict_behind_nested_dict():
    """Real xref streams carry nested dicts (/DecodeParms << ... >>)
    BEFORE /Type — the balanced-dict walk must still find /Encrypt in
    the outer dict."""
    from gonova_document_parser_spark.spec.pdfx import _is_encrypted

    doc = (
        b"%PDF-1.5\n1 0 obj\n<< /DecodeParms << /Columns 5 /Predictor 12 >> "
        b"/Type /XRef /Size 7 /Encrypt 5 0 R /W [1 2 1] >>\nendobj\n%%EOF\n"
    )
    assert _is_encrypted(doc)
    benign = (
        b"%PDF-1.5\n1 0 obj\n<< /DecodeParms << /Columns 5 >> "
        b"/Type /XRef /Size 7 >>\nendobj\n%%EOF\n"
    )
    assert not _is_encrypted(benign)


def test_xref_type_decoys_cannot_hide_encrypted_xref_stream():
    """ADVICE r5: the xref-stream arm must mirror the trailer fix — >64
    decoy '/Type /XRef' keyword sites planted AHEAD of the authoritative
    (last-written) encrypted xref stream dict must not exhaust the
    _MAX_SITES cap and smuggle the document through as unencrypted."""
    content = b"BT 1 0 0 1 50 700 Tm (would be ciphertext) Tj ET"
    data = _doc([content])
    # decoy keyword sites with no parseable << >> dict around them
    decoys = b"/Type /XRef \n" * 200
    enc = data.replace(
        b"%%EOF",
        decoys
        + b"<< /Type /XRef /W [1 2 2] /Encrypt 9 0 R /Root 1 0 R >>\n"
        b"stream\nxx\nendstream\n%%EOF",
    )
    assert pdf_text_len(enc) == 0
    assert extract_pdf_pages(enc) == []


def test_xref_back_decoys_cannot_hide_encrypted_xref_stream():
    """Decoy '/Type /XRef' keyword sites planted AFTER the authoritative
    encrypted xref dict (the direction the round-5-style last-N window
    alone would still miss) must not evade detection: bare keyword sites
    have no parseable dict and never consume the site budget, and a
    decoy adjacent to the real dict finds it through its own window."""
    content = b"BT 1 0 0 1 50 700 Tm (would be ciphertext) Tj ET"
    data = _doc([content])
    decoys = b"/Type /XRef \n" * 200
    enc = data.replace(
        b"%%EOF",
        b"<< /Type /XRef /W [1 2 2] /Encrypt 9 0 R /Root 1 0 R >>\n"
        b"stream\nxx\nendstream\n" + decoys + b"%%EOF",
    )
    assert pdf_text_len(enc) == 0
    assert extract_pdf_pages(enc) == []
