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

    # ---- xrefstream.pdf: startxref points at an OBJECT (xref stream
    # layout) -> loud reject
    x = PdfBuilder()
    x.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    x.obj(2, b"<< /Type /Pages /Count 0 /Kids [] >>")
    raw = bytes(x.buf)
    obj1_at = x.offsets[1]
    xs = raw + (b"startxref\n%d\n%%%%EOF\n" % obj1_at)
    with open(os.path.join(OUT, "xrefstream.pdf"), "wb") as f:
        f.write(xs)

    # ---- badfilter.pdf: /LZWDecode content -> loud reject
    bf = PdfBuilder()
    bf.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    bf.obj(2, b"<< /Type /Pages /Count 1 /Kids [5 0 R] >>")
    bf.obj(4, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    bf.obj(5, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R" + res + b" >>")
    payload = b"\x80\x0b\x60\x50"
    bf.offsets[6] = len(bf.buf)
    bf.buf += b"6 0 obj\n<< /Length %d /Filter /LZWDecode >>\nstream\n" % len(payload)
    bf.buf += payload
    bf.buf += b"\nendstream\nendobj\n"
    bad = bf.finish()
    with open(os.path.join(OUT, "badfilter.pdf"), "wb") as f:
        f.write(bad)

    with open(os.path.join(OUT, "manifest.json"), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, ensure_ascii=False)
    print(f"wrote {OUT}: rich.pdf ({len(data)} B) + 3 reject fixtures")


if __name__ == "__main__":
    gen()
