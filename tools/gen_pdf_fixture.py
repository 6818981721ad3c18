#!/usr/bin/env python3
"""Golden PDF fixtures for PdfText — written INDEPENDENTLY with raw
bytes + zlib (the gen_mp4_fixture discipline: the engine's extractor is
checked against bytes it did not produce). Exercises the surface the
engine declares: classic xref tables, FlateDecode and raw content
streams, /Length as an indirect reference, a nested /Pages tree,
multiple /Contents streams on one page, Tj / TJ-with-kerns / ' line
shows, literal strings with octal + paren escapes, hex strings, and
non-UTF-8 (Windows-1252) shown bytes. Emits a manifest with the
expected extracted text per file, plus reject fixtures (encrypted,
xref stream, unknown filter) the reader must fail loudly on.

Extraction semantics pinned here (must match PdfText.extractPageText):
shown strings concatenate onto the current line; Td/TD with dy != 0,
T*, Tm, and ' break lines; breaks before the first show op on a page
are ignored; pages join with '\n'.
"""
import json
import os
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "fixtures", "pdf_golden")


class PdfBuilder:
    def __init__(self):
        self.buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        self.offsets = {}

    def obj(self, num, body: bytes):
        self.offsets[num] = len(self.buf)
        self.buf += b"%d 0 obj\n" % num
        self.buf += body
        self.buf += b"\nendobj\n"

    def stream_obj(self, num, data: bytes, extra=b"", length_ref=None,
                   flate=True):
        payload = zlib.compress(data) if flate else data
        if length_ref is None:
            head = b"<< /Length %d%s%s >>" % (
                len(payload), b" /Filter /FlateDecode" if flate else b"", extra)
        else:
            head = b"<< /Length %d 0 R%s%s >>" % (
                length_ref, b" /Filter /FlateDecode" if flate else b"", extra)
        self.offsets[num] = len(self.buf)
        self.buf += b"%d 0 obj\n" % num
        self.buf += head + b"\nstream\n"
        self.buf += payload
        self.buf += b"\nendstream\nendobj\n"
        return len(payload)

    def finish(self, root=1, extra_trailer=b""):
        n = max(self.offsets) + 1
        xref_at = len(self.buf)
        self.buf += b"xref\n0 %d\n" % n
        self.buf += b"0000000000 65535 f \n"
        for i in range(1, n):
            off = self.offsets.get(i, 0)
            kind = b"n" if i in self.offsets else b"f"
            self.buf += b"%010d 00000 %s \n" % (off, kind)
        self.buf += (b"trailer\n<< /Size %d /Root %d 0 R%s >>\n"
                     b"startxref\n%d\n%%%%EOF\n"
                     % (n, root, extra_trailer, xref_at))
        return bytes(self.buf)


def gen():
    os.makedirs(OUT, exist_ok=True)
    manifest = {}

    # ---- rich.pdf: 3 pages under a NESTED Pages tree.
    # page 1: Tj lines + TJ with kerns + octal/paren escapes
    # page 2: ' operator + hex string + TWO content streams
    # page 3: raw (uncompressed) stream, /Length indirect, cp1252 bytes
    b = PdfBuilder()
    b.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    # nested tree: 2 -> [3 (Pages) , 30 (Page)] ; 3 -> [10, 20]
    b.obj(2, b"<< /Type /Pages /Count 3 /Kids [3 0 R 30 0 R] >>")
    b.obj(3, b"<< /Type /Pages /Parent 2 0 R /Count 2 /Kids [10 0 R 20 0 R] >>")
    b.obj(4, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    res = b" /Resources << /Font << /F1 4 0 R >> >> /MediaBox [0 0 612 792]"
    b.obj(10, b"<< /Type /Page /Parent 3 0 R /Contents 11 0 R" + res + b" >>")
    c1 = (b"BT /F1 12 Tf 72 720 Td\n"
          b"(First line with \\(escaped parens\\) and (nested) ok) Tj\n"
          b"0 -14 TD\n"
          b"[(kerned ) -120 (pieces ) 80 (join)] TJ\n"
          b"0 -14 TD\n"
          b"(octal \\101\\102\\103 done) Tj\n"
          b"ET")
    b.stream_obj(11, c1)
    p1 = ("First line with (escaped parens) and (nested) ok\n"
          "kerned pieces join\n"
          "octal ABC done")

    b.obj(20, b"<< /Type /Page /Parent 3 0 R /Contents [21 0 R 22 0 R]" +
          res + b" >>")
    c2a = (b"BT /F1 12 Tf 72 720 Td\n"
           b"(page two opens) Tj\n")
    c2b = (b"(: continued) Tj\n"
           b"(next via quote) '\n"
           b"<68657820627974657321> Tj\n"
           b"ET")
    b.stream_obj(21, c2a)
    b.stream_obj(22, c2b)
    p2 = ("page two opens: continued\n"
          "next via quote"
          "hex bytes!")
    # NOTE: ' breaks THEN shows, and the following hex Tj appends to the
    # same line — so "next via quote" and "hex bytes!" share a line.
    p2 = ("page two opens: continued\n"
          "next via quotehex bytes!")

    b.obj(30, b"<< /Type /Page /Parent 2 0 R /Contents 31 0 R" + res + b" >>")
    c3 = ("BT /F1 12 Tf 72 720 Td\n"
          "(caf\xe9 \xfcml\xe4ut in cp1252) Tj\n"
          "0 -14 TD\n(last page) Tj\nET").encode("cp1252")
    ln = b.stream_obj(31, c3, length_ref=32, flate=False)
    b.obj(32, b"%d" % ln)
    p3 = "café ümläut in cp1252\nlast page"

    data = b.finish()
    with open(os.path.join(OUT, "rich.pdf"), "wb") as f:
        f.write(data)
    manifest["rich.pdf"] = {"pages": 3, "text": "\n".join([p1, p2, p3])}

    # ---- encrypted.pdf: trailer carries /Encrypt -> loud reject
    e = PdfBuilder()
    e.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    e.obj(2, b"<< /Type /Pages /Count 0 /Kids [] >>")
    e.obj(3, b"<< /Filter /Standard >>")
    enc = e.finish(extra_trailer=b" /Encrypt 3 0 R")
    with open(os.path.join(OUT, "encrypted.pdf"), "wb") as f:
        f.write(enc)

    # ---- notxref.pdf: startxref points at an object that is NEITHER an
    # xref table NOR a /Type/XRef stream -> loud reject (r18: real xref
    # streams now parse, so the reject is the mistyped target)
    x = PdfBuilder()
    x.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    x.obj(2, b"<< /Type /Pages /Count 0 /Kids [] >>")
    raw = bytes(x.buf)
    obj1_at = x.offsets[1]
    xs = raw + (b"startxref\n%d\n%%%%EOF\n" % obj1_at)
    with open(os.path.join(OUT, "notxref.pdf"), "wb") as f:
        f.write(xs)

    # ---- xrefstream.pdf (r18): the SAME three pages as rich.pdf in the
    # PDF 1.5+ framing — non-stream objects inside a /Type/ObjStm,
    # cross-reference STREAM with W=[1 3 2], an /Index with TWO
    # subsections, and the xref stream compressed through the PNG-Up
    # predictor (/DecodeParms /Predictor 12). Written independently with
    # struct + zlib; extraction must be text-identical to rich.pdf.
    #
    # numbering: 1=ObjStm  2=catalog 3=pages-root 4=nested-pages 5=font
    # 6/7/8=page dicts (2..8 all compressed, ObjStm order below)
    # 9,10,11,12=content streams (page2 has TWO: 10a=10,10b=11 wait —
    # keep it simple: 9=p1, 10=p2a, 11=p2b, 12=p3-raw, 13=p3 /Length obj
    # lives IN the ObjStm (an indirect /Length resolved through a
    # type-2 entry), 14=xref stream.
    import struct

    def u24(v):
        return struct.pack(">I", v)[1:]

    xb = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}

    c3_raw_len = len(c3)
    objstm_members = [
        (2, b"<< /Type /Catalog /Pages 3 0 R >>"),
        (3, b"<< /Type /Pages /Count 3 /Kids [4 0 R 8 0 R] >>"),
        (4, b"<< /Type /Pages /Parent 3 0 R /Count 2 /Kids [6 0 R 7 0 R] >>"),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        (6, b"<< /Type /Page /Parent 4 0 R /Contents 9 0 R" +
            res.replace(b"4 0 R", b"5 0 R") + b" >>"),
        (7, b"<< /Type /Page /Parent 4 0 R /Contents [10 0 R 11 0 R]" +
            res.replace(b"4 0 R", b"5 0 R") + b" >>"),
        (8, b"<< /Type /Page /Parent 3 0 R /Contents 12 0 R" +
            res.replace(b"4 0 R", b"5 0 R") + b" >>"),
        (13, b"%d" % c3_raw_len),
    ]
    header = b""
    body = b""
    for num, objbytes in objstm_members:
        header += b"%d %d " % (num, len(body))
        body += objbytes + b"\n"
    header = header[:-1] + b"\n"
    payload = header + body
    zpay = zlib.compress(payload)
    offsets[1] = len(xb)
    xb += (b"1 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
           b"/Filter /FlateDecode >>\nstream\n"
           % (len(objstm_members), len(header), len(zpay)))
    xb += zpay
    xb += b"\nendstream\nendobj\n"

    def file_stream(num, data, flate=True, length_ref=None):
        pay = zlib.compress(data) if flate else data
        if length_ref is None:
            head = b"<< /Length %d%s >>" % (
                len(pay), b" /Filter /FlateDecode" if flate else b"")
        else:
            head = b"<< /Length %d 0 R%s >>" % (
                length_ref, b" /Filter /FlateDecode" if flate else b"")
        offsets[num] = len(xb)
        xb.extend(b"%d 0 obj\n" % num + head + b"\nstream\n" + pay +
                  b"\nendstream\nendobj\n")

    file_stream(9, c1)
    file_stream(10, c2a)
    file_stream(11, c2b)
    # page-3 content raw (uncompressed) with its /Length an INDIRECT ref
    # into the ObjStm — resolving it forces a type-2 lookup mid-stream
    file_stream(12, c3, flate=False, length_ref=13)

    # xref stream: W=[1 3 2]; /Index [0 2  6 9] exercises subsection
    # gaps (objects 2..5 are NOT listed in the first subsection — they
    # arrive via the second? No: keep every live object covered with
    # two subsections [0 6) and [6 15).)
    size = 15
    rows = {}
    rows[0] = b"\x00" + u24(0) + struct.pack(">H", 0xFFFF)
    rows[1] = b"\x01" + u24(offsets[1]) + struct.pack(">H", 0)
    for idx, (num, _) in enumerate(objstm_members):
        rows[num] = b"\x02" + u24(1) + struct.pack(">H", idx)
    for num in (9, 10, 11, 12):
        rows[num] = b"\x01" + u24(offsets[num]) + struct.pack(">H", 0)
    xref_at = len(xb)
    rows[14] = b"\x01" + u24(xref_at) + struct.pack(">H", 0)
    index = [(0, 6), (6, 9)]
    table = b"".join(rows[n] for s, c in index for n in range(s, s + c))
    # PNG-Up predictor over 6-byte rows
    rowlen = 6
    pred = bytearray()
    prev = bytes(rowlen)
    for i in range(0, len(table), rowlen):
        cur = table[i:i + rowlen]
        pred += b"\x02" + bytes((cur[j] - prev[j]) & 0xFF
                                for j in range(rowlen))
        prev = cur
    zx = zlib.compress(bytes(pred))
    xb += (b"14 0 obj\n<< /Type /XRef /Size %d /W [1 3 2] "
           b"/Index [0 6 6 9] /Root 2 0 R /Filter /FlateDecode "
           b"/DecodeParms << /Predictor 12 /Columns %d >> /Length %d "
           b">>\nstream\n" % (size, rowlen, len(zx)))
    xb += zx
    xb += b"\nendstream\nendobj\nstartxref\n%d\n%%%%EOF\n" % xref_at
    with open(os.path.join(OUT, "xrefstream.pdf"), "wb") as f:
        f.write(bytes(xb))
    manifest["xrefstream.pdf"] = {"pages": 3,
                                  "text": "\n".join([p1, p2, p3])}

    # ---- hybrid.pdf (r18): a classic xref TABLE whose trailer carries
    # /XRefStm pointing at a supplemental xref STREAM that holds the
    # type-2 entries for ObjStm-compressed objects — the Acrobat 6
    # hybrid-reference layout. One page; catalog/pages/font/page dicts
    # compressed; TIFF predictor 2 on the supplemental stream for
    # coverage of the non-PNG predictor path.
    hb = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    hoff = {}
    members = [
        (2, b"<< /Type /Catalog /Pages 3 0 R >>"),
        (3, b"<< /Type /Pages /Count 1 /Kids [4 0 R] >>"),
        (4, b"<< /Type /Page /Parent 3 0 R /Contents 6 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> /MediaBox [0 0 612 792] >>"),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    hheader = b""
    hbody = b""
    for num, ob in members:
        hheader += b"%d %d " % (num, len(hbody))
        hbody += ob + b"\n"
    hheader = hheader[:-1] + b"\n"
    hpay = hheader + hbody
    hz = zlib.compress(hpay)
    hoff[1] = len(hb)
    hb += (b"1 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
           b"/Filter /FlateDecode >>\nstream\n"
           % (len(members), len(hheader), len(hz)))
    hb += hz + b"\nendstream\nendobj\n"
    hc = (b"BT /F1 12 Tf 72 720 Td\n(hybrid xref resolved) Tj\n"
          b"0 -14 TD\n(second line) Tj\nET")
    hzc = zlib.compress(hc)
    hoff[6] = len(hb)
    hb += (b"6 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
           % len(hzc)) + hzc + b"\nendstream\nendobj\n"
    # supplemental xref stream (type-2 entries), TIFF predictor 2
    hrows = b""
    for idx, (num, _) in enumerate(members):
        hrows += b"\x02" + u24(1) + struct.pack(">H", idx)
    rowlen = 6
    tiffed = bytearray()
    for i in range(0, len(hrows), rowlen):
        cur = bytearray(hrows[i:i + rowlen])
        for j in range(rowlen - 1, 0, -1):
            cur[j] = (cur[j] - cur[j - 1]) & 0xFF
        tiffed += cur
    hzx = zlib.compress(bytes(tiffed))
    hxs_at = len(hb)
    hoff[7] = hxs_at
    hb += (b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 3 2] /Index [2 4] "
           b"/Root 2 0 R /Filter /FlateDecode "
           b"/DecodeParms << /Predictor 2 /Columns 6 >> /Length %d "
           b">>\nstream\n" % len(hzx)) + hzx + b"\nendstream\nendobj\n"
    # classic table: objects 1 (ObjStm), 6 (content), 7 (xref stream);
    # compressed objects are FREE here — the /XRefStm supplies them
    table_at = len(hb)
    hb += b"xref\n0 8\n"
    for i in range(8):
        if i in hoff:
            hb += b"%010d 00000 n \n" % hoff[i]
        else:
            hb += b"0000000000 65535 f \n"
    hb += (b"trailer\n<< /Size 8 /Root 2 0 R /XRefStm %d >>\n"
           b"startxref\n%d\n%%%%EOF\n" % (hxs_at, table_at))
    with open(os.path.join(OUT, "hybrid.pdf"), "wb") as f:
        f.write(bytes(hb))
    manifest["hybrid.pdf"] = {"pages": 1,
                              "text": "hybrid xref resolved\nsecond line"}

    # ---- badfilter.pdf: /JBIG2Decode content -> loud reject (r18: LZW
    # decodes now, so the unsupported-filter pin moved to a filter that
    # stays out of scope)
    bf = PdfBuilder()
    bf.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    bf.obj(2, b"<< /Type /Pages /Count 1 /Kids [5 0 R] >>")
    bf.obj(4, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    bf.obj(5, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R" + res + b" >>")
    payload = b"\x80\x0b\x60\x50"
    bf.offsets[6] = len(bf.buf)
    bf.buf += b"6 0 obj\n<< /Length %d /Filter /JBIG2Decode >>\nstream\n" % len(payload)
    bf.buf += payload
    bf.buf += b"\nendstream\nendobj\n"
    bad = bf.finish()
    with open(os.path.join(OUT, "badfilter.pdf"), "wb") as f:
        f.write(bad)

    # ---- filters.pdf (r18): legacy encode chains — page 1's content is
    # [ASCII85Decode, FlateDecode] (filters apply in array order: un-85
    # THEN inflate), page 2's is bare ASCIIHexDecode, page 3 LZWDecode
    # (MSB-first TIFF-variant codes, EarlyChange 1 — encoded by the
    # from-scratch encoder below, long enough to force a width bump),
    # page 4 RunLengthDecode. Written with python's independent stdlib
    # base64.a85encode / hex and hand-rolled LZW/RLE encoders.
    import base64

    def lzw_encode(data: bytes) -> bytes:
        # MSB-first PDF/TIFF LZW with EarlyChange=1: ClearTable first,
        # dictionary strings -> codes from 258, EOD 257. Width sync: the
        # encoder's post-add next_code runs one AHEAD of the decoder's
        # table size at the same emission index, so the early-change
        # decoder bump (table size 511/1023/2047) corresponds to
        # next_code >= 1 << width here.
        out_bits = []
        width = 9
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        out_bits.append((256, width))
        w = b""
        for ch in data:
            c = bytes([ch])
            if w + c in table:
                w = w + c
            else:
                out_bits.append((table[w], width))
                table[w + c] = next_code
                next_code += 1
                if next_code >= (1 << width) and width < 12:
                    width += 1
                w = c
        if w:
            out_bits.append((table[w], width))
        out_bits.append((257, width))
        buf = bytearray()
        acc, nbits = 0, 0
        for code, wd in out_bits:
            acc = (acc << wd) | code
            nbits += wd
            while nbits >= 8:
                buf.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            buf.append((acc << (8 - nbits)) & 0xFF)
        return bytes(buf)

    def rle_encode(data: bytes) -> bytes:
        # simple literal/repeat runs + EOD 128
        out = bytearray()
        i = 0
        while i < len(data):
            # find a repeat run
            j = i
            while j + 1 < len(data) and data[j + 1] == data[i] and \
                    j - i < 126:
                j += 1
            if j > i + 1:  # repeat of length >= 3 pays
                out.append(257 - (j - i + 1))
                out.append(data[i])
                i = j + 1
            else:
                # literal run to the next repeat (or 128 cap)
                k = i
                while k < len(data) and k - i < 127:
                    if k + 2 < len(data) and data[k] == data[k + 1] == data[k + 2]:
                        break
                    k += 1
                out.append(k - i - 1)  # literal of n bytes: length n-1
                out += data[i:k]
                i = k
        out.append(128)
        return bytes(out)

    def rle_decode_check(enc: bytes) -> bytes:
        # pure-python inverse, to sanity-check the encoder itself
        out = bytearray()
        i = 0
        while True:
            n = enc[i]; i += 1
            if n == 128:
                return bytes(out)
            if n < 128:
                out += enc[i:i + n + 1]; i += n + 1
            else:
                out += bytes([enc[i]]) * (257 - n); i += 1

    fb2 = PdfBuilder()
    fb2.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    fb2.obj(2, b"<< /Type /Pages /Count 4 /Kids [10 0 R 20 0 R 30 0 R 40 0 R] >>")
    fb2.obj(4, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    fb2.obj(10, b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R" + res + b" >>")
    fc1 = (b"BT /F1 12 Tf 72 720 Td\n"
           b"(ascii85 then flate survives) Tj\n"
           b"0 -14 TD\n(with a zero\\000group maybe) Tj\nET")
    pay1 = base64.a85encode(zlib.compress(fc1)) + b"~>"
    fb2.offsets[11] = len(fb2.buf)
    fb2.buf += (b"11 0 obj\n<< /Length %d /Filter [/ASCII85Decode "
                b"/FlateDecode] >>\nstream\n" % len(pay1))
    fb2.buf += pay1 + b"\nendstream\nendobj\n"
    fb2.obj(20, b"<< /Type /Page /Parent 2 0 R /Contents 21 0 R" + res + b" >>")
    fc2 = b"BT /F1 12 Tf 72 720 Td\n(hex page two) Tj\nET"
    pay2 = fc2.hex().upper().encode("ascii")
    # whitespace inside the hex stream must be skipped
    pay2 = b"\n".join(pay2[i:i + 40] for i in range(0, len(pay2), 40)) + b">"
    fb2.offsets[21] = len(fb2.buf)
    fb2.buf += (b"21 0 obj\n<< /Length %d /Filter /ASCIIHexDecode >>"
                b"\nstream\n" % len(pay2))
    fb2.buf += pay2 + b"\nendstream\nendobj\n"
    # page 3: LZWDecode, with enough distinct dictionary growth to force
    # a 9->10-bit width bump (>253 added entries) — the text repeats
    # varied words so the table genuinely grows
    fb2.obj(30, b"<< /Type /Page /Parent 2 0 R /Contents 31 0 R" + res + b" >>")
    lzw_lines = []
    for i in range(40):
        lzw_lines.append("(lzw line %02d: alpha%02d beta%02d gamma%02d) Tj"
                         % (i, i, (i * 7) % 100, (i * 13) % 100))
    fc3 = ("BT /F1 12 Tf 72 720 Td\n" +
           "\n0 -14 TD\n".join(lzw_lines) + "\nET").encode("ascii")
    pay3 = lzw_encode(fc3)
    fb2.offsets[31] = len(fb2.buf)
    fb2.buf += (b"31 0 obj\n<< /Length %d /Filter /LZWDecode >>"
                b"\nstream\n" % len(pay3))
    fb2.buf += pay3 + b"\nendstream\nendobj\n"
    p3_text = "\n".join("lzw line %02d: alpha%02d beta%02d gamma%02d"
                        % (i, i, (i * 7) % 100, (i * 13) % 100)
                        for i in range(40))
    # page 4: RunLengthDecode with literal and repeat runs
    fb2.obj(40, b"<< /Type /Page /Parent 2 0 R /Contents 41 0 R" + res + b" >>")
    fc4 = (b"BT /F1 12 Tf 72 720 Td\n"
           b"(rle page: aaaaaaaaaaaaaaaaaaaaaa then text) Tj\nET")
    pay4 = rle_encode(fc4)
    assert any(b > 128 for b in pay4[:-1]), "RLE fixture must contain a repeat run"
    fb2.offsets[41] = len(fb2.buf)
    fb2.buf += (b"41 0 obj\n<< /Length %d /Filter /RunLengthDecode >>"
                b"\nstream\n" % len(pay4))
    fb2.buf += pay4 + b"\nendstream\nendobj\n"
    fdata = fb2.finish()
    with open(os.path.join(OUT, "filters.pdf"), "wb") as f:
        f.write(fdata)
    manifest["filters.pdf"] = {
        "pages": 4,
        "text": ("ascii85 then flate survives\nwith a zero\x00group maybe\n"
                 "hex page two\n" + p3_text +
                 "\nrle page: aaaaaaaaaaaaaaaaaaaaaa then text")}
    # sanity: the python RLE encoder inverts correctly
    assert rle_decode_check(pay4) == fc4

    # ---- fonts.pdf (r19): show strings decode through FONTS.
    # page 1: /Encoding dict — WinAnsi base + /Differences remapping
    #   A->Eacute B->eacute a->uni0142 b->u1F600 (AGL name conventions,
    #   incl. a non-BMP u-name); unremapped codes fall to WinAnsi
    #   (0x80 euro, 0xE9 eacute). FontDescriptor /Flags 4 proves a
    #   declared /Encoding wins even for a SYMBOLIC font.
    # page 2: named /StandardEncoding (quoteright at 0x27, quoteleft at
    #   0x60, fi/fl ligatures at 0xAE/0xAF) then a MID-PAGE Tf switch
    #   to a /MacRomanEncoding font (0x8E = eacute).
    # page 3: simple TrueType with /ToUnicode — bfchar to a TWO-char
    #   destination and a bfrange mapping A..Z codes to a..z: the CMap
    #   must win over any byte heuristic.
    # page 4: Type0 /Identity-H + /ToUnicode with 2-byte CIDs — bfchar,
    #   incrementing bfrange, and ARRAY-form bfrange destinations.
    fo = PdfBuilder()
    fo.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    fo.obj(2, b"<< /Type /Pages /Count 4 /Kids [10 0 R 20 0 R 30 0 R 40 0 R] >>")
    fo.obj(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /GRAFTB+Custom"
              b" /FontDescriptor 13 0 R /Encoding << /BaseEncoding"
              b" /WinAnsiEncoding /Differences"
              b" [65 /Eacute /eacute 97 /uni0142 /u1F600] >> >>")
    fo.obj(13, b"<< /Type /FontDescriptor /Flags 4 /FontName /GRAFTB+Custom >>")
    fo.obj(4, b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman"
              b" /Encoding /StandardEncoding >>")
    fo.obj(5, b"<< /Type /Font /Subtype /TrueType /BaseFont /Arial"
              b" /Encoding /MacRomanEncoding >>")
    fo.obj(6, b"<< /Type /Font /Subtype /TrueType /BaseFont /GRAFTC+Sub"
              b" /ToUnicode 7 0 R >>")
    cmap1 = (b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
             b"begincmap\n/CMapName /GRAFTC-UCS def\n/CMapType 2 def\n"
             b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
             b"1 beginbfchar\n<01> <00580079>\nendbfchar\n"
             b"1 beginbfrange\n<41> <5A> <0061>\nendbfrange\n"
             b"endcmap\nend\nend\n")
    fo.stream_obj(7, cmap1)
    fo.obj(8, b"<< /Type /Font /Subtype /Type0 /BaseFont /GRAFTD+CID"
              b" /Encoding /Identity-H /DescendantFonts [9 0 R]"
              b" /ToUnicode 12 0 R >>")
    fo.obj(9, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GRAFTD+CID"
              b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
              b" /Supplement 0 >> /DW 500 >>")
    cmap2 = (b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
             b"begincmap\n/CIDSystemInfo << /Registry (Adobe)"
             b" /Ordering (UCS) /Supplement 0 >> def\n"
             b"/CMapName /GRAFTD-UCS def\n/CMapType 2 def\n"
             b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
             b"1 beginbfchar\n<0001> <0048>\nendbfchar\n"
             b"2 beginbfrange\n<0002> <0004> <0065>\n"
             b"<0005> <0006> [<006C006C> <006F>]\nendbfrange\n"
             b"endcmap\nend\nend\n")
    fo.stream_obj(12, cmap2)
    fo.obj(10, b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R /Resources"
               b" << /Font << /FD 3 0 R >> >> /MediaBox [0 0 612 792] >>")
    fo.stream_obj(11, b"BT /FD 12 Tf 72 720 Td\n(AB ab \x80\xe9) Tj\nET")
    fp1 = "Éé ł\U0001F600 €é"
    fo.obj(20, b"<< /Type /Page /Parent 2 0 R /Contents 21 0 R /Resources"
               b" << /Font << /FS 4 0 R /FM 5 0 R >> >> /MediaBox [0 0 612 792] >>")
    fo.stream_obj(21, b"BT /FS 12 Tf 72 720 Td\n('std` \xae\xaf) Tj\n"
                      b"0 -14 TD\n/FM 12 Tf\n(caf\x8e) Tj\nET")
    fp2 = "’std‘ ﬁﬂ\ncafé"
    fo.obj(30, b"<< /Type /Page /Parent 2 0 R /Contents 31 0 R /Resources"
               b" << /Font << /FT 6 0 R >> >> /MediaBox [0 0 612 792] >>")
    fo.stream_obj(31, b"BT /FT 12 Tf 72 720 Td\n(\x01ABC) Tj\nET")
    fp3 = "Xyabc"
    fo.obj(40, b"<< /Type /Page /Parent 2 0 R /Contents 41 0 R /Resources"
               b" << /Font << /F0 8 0 R >> >> /MediaBox [0 0 612 792] >>")
    fo.stream_obj(41, b"BT /F0 12 Tf 72 720 Td\n<0001000200050006> Tj\n"
                      b"0 -14 TD\n<00030004> Tj\nET")
    fp4 = "Hello\nfg"
    with open(os.path.join(OUT, "fonts.pdf"), "wb") as f:
        f.write(fo.finish())
    manifest["fonts.pdf"] = {"pages": 4,
                             "text": "\n".join([fp1, fp2, fp3, fp4])}

    # ---- badfont.pdf: a USED symbolic font with neither /Encoding nor
    # /ToUnicode — its codes are font-internal, so extraction must
    # reject loudly instead of guessing cp1252
    bfo = PdfBuilder()
    bfo.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    bfo.obj(2, b"<< /Type /Pages /Count 1 /Kids [4 0 R] >>")
    bfo.obj(3, b"<< /Type /Font /Subtype /TrueType /BaseFont /GRAFTE+Sym"
               b" /FontDescriptor 6 0 R >>")
    bfo.obj(6, b"<< /Type /FontDescriptor /Flags 4 /FontName /GRAFTE+Sym >>")
    bfo.obj(4, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R /Resources"
               b" << /Font << /F1 3 0 R >> >> /MediaBox [0 0 612 792] >>")
    bfo.stream_obj(5, b"BT /F1 12 Tf 72 720 Td\n(abc) Tj\nET")
    with open(os.path.join(OUT, "badfont.pdf"), "wb") as f:
        f.write(bfo.finish())

    # ---- badglyph.pdf: /Differences names a subset-PRIVATE glyph
    # (/g123, no public Unicode mapping) -> loud reject on font use
    bgo = PdfBuilder()
    bgo.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    bgo.obj(2, b"<< /Type /Pages /Count 1 /Kids [4 0 R] >>")
    bgo.obj(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /GRAFTF+Priv"
               b" /Encoding << /Differences [65 /g123] >> >>")
    bgo.obj(4, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R /Resources"
               b" << /Font << /F1 3 0 R >> >> /MediaBox [0 0 612 792] >>")
    bgo.stream_obj(5, b"BT /F1 12 Tf 72 720 Td\n(A) Tj\nET")
    with open(os.path.join(OUT, "badglyph.pdf"), "wb") as f:
        f.write(bgo.finish())

    # ---- notounicode.pdf: Type0/Identity-H WITHOUT /ToUnicode — CID
    # codes are unmappable -> loud reject on font use
    nto = PdfBuilder()
    nto.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    nto.obj(2, b"<< /Type /Pages /Count 1 /Kids [5 0 R] >>")
    nto.obj(3, b"<< /Type /Font /Subtype /Type0 /BaseFont /GRAFTG+CID"
               b" /Encoding /Identity-H /DescendantFonts [4 0 R] >>")
    nto.obj(4, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GRAFTG+CID"
               b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
               b" /Supplement 0 >> /DW 500 >>")
    nto.obj(5, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R /Resources"
               b" << /Font << /F1 3 0 R >> >> /MediaBox [0 0 612 792] >>")
    nto.stream_obj(6, b"BT /F1 12 Tf 72 720 Td\n<0001> Tj\nET")
    with open(os.path.join(OUT, "notounicode.pdf"), "wb") as f:
        f.write(nto.finish())

    # ---- encrypted fixtures (r19): standard security handler with an
    # EMPTY user password — rc4_40.pdf (V1/R2), rc4_128.pdf (V2/R3/128),
    # aes128.pdf (V4/R4 /AESV2) — plus passworded.pdf (real user
    # password) which must reject loudly. All crypto below is
    # INDEPENDENT pure python (hashlib MD5 + hand-rolled RC4 and
    # AES-128, the latter checked against the FIPS-197 C.1 vector).
    import hashlib
    import struct as _st

    PADB = bytes([
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])

    def rc4(key, data):
        s = list(range(256))
        j = 0
        for i in range(256):
            j = (j + s[i] + key[i % len(key)]) & 0xFF
            s[i], s[j] = s[j], s[i]
        out = bytearray()
        i = j = 0
        for b in data:
            i = (i + 1) & 0xFF
            j = (j + s[i]) & 0xFF
            s[i], s[j] = s[j], s[i]
            out.append(b ^ s[(s[i] + s[j]) & 0xFF])
        return bytes(out)

    def pw_pad(pw):
        return (pw + PADB)[:32]

    def compute_O(owner_pw, user_pw, r, n):
        d = hashlib.md5(pw_pad(owner_pw or user_pw)).digest()
        if r >= 3:
            for _ in range(50):
                d = hashlib.md5(d).digest()
        key = d[:n]
        o = rc4(key, pw_pad(user_pw))
        if r >= 3:
            for i in range(1, 20):
                o = rc4(bytes(b ^ i for b in key), o)
        return o

    def file_key(user_pw, o, p, id0, r, n):
        h = hashlib.md5()
        h.update(pw_pad(user_pw))
        h.update(o)
        h.update(_st.pack("<i", p))
        h.update(id0)
        key = h.digest()
        if r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        return key[:n]

    def compute_U(key, id0, r):
        if r == 2:
            return rc4(key, PADB)
        x = rc4(key, hashlib.md5(PADB + id0).digest())
        for i in range(1, 20):
            x = rc4(bytes(b ^ i for b in key), x)
        return x + b"\x00" * 16

    def obj_key(key, num, gen, aes):
        h = hashlib.md5(key + _st.pack("<i", num)[:3] +
                        _st.pack("<i", gen)[:2] + (b"sAlT" if aes else b""))
        return h.digest()[:min(len(key) + 5, 16)]

    # AES-128 encrypt, from FIPS-197 directly
    SBOX = [0] * 256
    SBOX[0] = 0x63
    _p = _q = 1
    while True:
        _p = (_p ^ ((_p << 1) & 0xFF) ^ (0x1B if _p & 0x80 else 0)) & 0xFF
        _q ^= (_q << 1) & 0xFF
        _q ^= (_q << 2) & 0xFF
        _q ^= (_q << 4) & 0xFF
        _q &= 0xFF
        if _q & 0x80:
            _q ^= 0x09
        _x = (_q ^ ((_q << 1) | (_q >> 7)) ^ ((_q << 2) | (_q >> 6)) ^
              ((_q << 3) | (_q >> 5)) ^ ((_q << 4) | (_q >> 4)))
        SBOX[_p] = (_x ^ 0x63) & 0xFF
        if _p == 1:
            break
    RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]

    def xtime(a):
        return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else (a << 1) & 0xFF

    def key_expand(key):
        w = [list(key[4 * i:4 * i + 4]) for i in range(4)]
        for i in range(4, 44):
            t = list(w[i - 1])
            if i % 4 == 0:
                t = t[1:] + t[:1]
                t = [SBOX[b] for b in t]
                t[0] ^= RCON[i // 4 - 1]
            w.append([a ^ b for a, b in zip(w[i - 4], t)])
        return w

    def aes_block(w, block):
        s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

        def ark(rnd):
            for c in range(4):
                for r in range(4):
                    s[r][c] ^= w[4 * rnd + c][r]
        ark(0)
        for rnd in range(1, 10):
            for r in range(4):
                for c in range(4):
                    s[r][c] = SBOX[s[r][c]]
            for r in range(1, 4):
                s[r] = s[r][r:] + s[r][:r]
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = xtime(a[0]) ^ xtime(a[1]) ^ a[1] ^ a[2] ^ a[3]
                s[1][c] = a[0] ^ xtime(a[1]) ^ xtime(a[2]) ^ a[2] ^ a[3]
                s[2][c] = a[0] ^ a[1] ^ xtime(a[2]) ^ xtime(a[3]) ^ a[3]
                s[3][c] = xtime(a[0]) ^ a[0] ^ a[1] ^ a[2] ^ xtime(a[3])
            ark(rnd)
        for r in range(4):
            for c in range(4):
                s[r][c] = SBOX[s[r][c]]
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]
        ark(10)
        return bytes(s[r][c] for c in range(4) for r in range(4))

    # FIPS-197 appendix C.1 vector
    assert aes_block(
        key_expand(bytes(range(16))),
        bytes(int(h, 16) for h in
              ["00", "11", "22", "33", "44", "55", "66", "77",
               "88", "99", "aa", "bb", "cc", "dd", "ee", "ff"])
    ).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a", "AES self-test failed"

    def aes_cbc_encrypt(key, iv, data):
        padn = 16 - len(data) % 16
        data = data + bytes([padn]) * padn
        w = key_expand(key)
        out = bytearray(iv)
        prev = iv
        for i in range(0, len(data), 16):
            blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
            c = aes_block(w, blk)
            out += c
            prev = c
        return bytes(out)

    def gen_encrypted(fname, v, r, nbits, aes, user_pw=b"",
                      label=""):
        n = 5 if r == 2 else nbits // 8
        p = -44
        id0 = hashlib.md5(fname.encode()).digest()
        owner_pw = b"owner-secret"
        o_entry = compute_O(owner_pw, user_pw, r, n)
        key = file_key(user_pw, o_entry, p, id0, r, n)
        u_entry = compute_U(key, id0, r)

        def enc_stream(num, data):
            if aes:
                iv = hashlib.md5(b"iv" + fname.encode() +
                                 bytes([num])).digest()
                return aes_cbc_encrypt(obj_key(key, num, 0, True), iv, data)
            return rc4(obj_key(key, num, 0, False), data)

        eb = PdfBuilder()
        eb.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        eb.obj(2, b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
        # an encrypted STRING rides in the page dict: the reader must
        # decrypt it to a parseable value while walking the page tree
        check = enc_stream(3, b"graft-check")
        check_hex = check.hex().upper().encode("ascii")
        eb.obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
                  b" /GraftCheck <" + check_hex + b">"
                  b" /Resources << /Font << /F1 5 0 R >> >>"
                  b" /MediaBox [0 0 612 792] >>")
        content = ("BT /F1 12 Tf 72 720 Td\n(%s secret line) Tj\n"
                   "0 -14 TD\n(second line) Tj\nET" % label).encode("ascii")
        payload = enc_stream(4, zlib.compress(content))
        eb.offsets[4] = len(eb.buf)
        eb.buf += (b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>"
                   b"\nstream\n" % len(payload))
        eb.buf += payload
        eb.buf += b"\nendstream\nendobj\n"
        eb.obj(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        edict = b"<< /Filter /Standard /V %d /R %d /Length %d /P %d" % (
            v, r, nbits, p)
        edict += b" /O <" + o_entry.hex().upper().encode() + b">"
        edict += b" /U <" + u_entry.hex().upper().encode() + b">"
        if v == 4:
            edict += (b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen"
                      b" /Length %d >> >> /StmF /StdCF /StrF /StdCF"
                      % (nbits // 8))
        edict += b" >>"
        eb.obj(6, edict)
        idhex = id0.hex().upper().encode()
        data = eb.finish(extra_trailer=b" /Encrypt 6 0 R /ID [<%s> <%s>]"
                         % (idhex, idhex))
        with open(os.path.join(OUT, fname), "wb") as f:
            f.write(data)
        return "%s secret line\nsecond line" % label

    manifest["rc4_40.pdf"] = {
        "pages": 1,
        "text": gen_encrypted("rc4_40.pdf", 1, 2, 40, False, label="rc4-40")}
    manifest["rc4_128.pdf"] = {
        "pages": 1,
        "text": gen_encrypted("rc4_128.pdf", 2, 3, 128, False,
                              label="rc4-128")}
    manifest["aes128.pdf"] = {
        "pages": 1,
        "text": gen_encrypted("aes128.pdf", 4, 4, 128, True,
                              label="aes-128")}
    gen_encrypted("passworded.pdf", 2, 3, 128, False,
                  user_pw=b"hunter2", label="locked")

    with open(os.path.join(OUT, "manifest.json"), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, ensure_ascii=False)
    print(f"wrote {OUT}: rich.pdf ({len(data)} B) + 3 reject fixtures")


if __name__ == "__main__":
    gen()
