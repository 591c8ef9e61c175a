"""Minimal dependency-free PDF 1.4 writer for the QC report.

The reference ships its report as a PDF rendered with reportlab + kaleido
(reference: src/phenoqc/reporting.py:41-829, 832-1081); neither library —
nor any other PDF tool — exists in this container, so this module emits
the PDF file format directly: base-14 Helvetica text operators (``BT /F1
Tf Td Tj ET``), vector rectangles (``re f``) and lines (``m l S``) in
uncompressed content streams, a flat page tree, and a hand-built xref
table.  Everything here is the public PDF 1.4 specification — no
compression, no font embedding, fully deterministic byte output (no
timestamps, no document ID), so report renders are byte-reproducible and
greppable in tests.

Coordinates: the canvas API is top-left-origin points (y grows downward,
like the SVG/HTML renderers in report.py); conversion to PDF's
bottom-left origin happens at operator-emission time.
"""

from __future__ import annotations

# Letter portrait, the reference's page size (reporting.py uses letter)
PAGE_W, PAGE_H = 612, 792

_FONTS = {False: "/F1", True: "/F2"}  # Helvetica / Helvetica-Bold

# Helvetica advance widths (per-mille of font size) for the printable
# ASCII range — the public AFM metrics; used only to right-align and
# truncate labels, so the nearest integer is plenty.
_HELV_W = (
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
)


def text_width(s: str, size: float) -> float:
    """Approximate rendered width of ``s`` in Helvetica at ``size`` pt."""
    total = 0
    for ch in s:
        o = ord(ch)
        total += _HELV_W[o - 32] if 32 <= o <= 126 else 556
    return total * size / 1000.0


def _esc(s: str) -> str:
    """PDF literal-string escaping; non-Latin-1 replaced (base-14 fonts
    carry WinAnsi — good enough for a QC report)."""
    s = s.encode("latin-1", "replace").decode("latin-1")
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class PdfCanvas:
    """Multi-page canvas; ``build()`` returns the finished PDF bytes."""

    def __init__(self) -> None:
        self._pages: list[list[str]] = []
        self.new_page()

    def new_page(self) -> None:
        self._pages.append([])

    def _op(self, s: str) -> None:
        self._pages[-1].append(s)

    def text(self, x: float, y: float, s: str, size: float = 11,
             bold: bool = False, color=(0.12, 0.16, 0.22)) -> None:
        r, g, b = color
        self._op(
            f"BT {_FONTS[bold]} {size:g} Tf {r:g} {g:g} {b:g} rg "
            f"{x:g} {PAGE_H - y:g} Td ({_esc(s)}) Tj ET"
        )

    def rect(self, x: float, y: float, w: float, h: float,
             fill=(0.22, 0.53, 0.9)) -> None:
        r, g, b = fill
        self._op(f"{r:g} {g:g} {b:g} rg {x:g} {PAGE_H - y - h:g} {w:g} {h:g} re f")

    def line(self, x1: float, y1: float, x2: float, y2: float,
             color=(0.9, 0.91, 0.92), width: float = 0.75) -> None:
        r, g, b = color
        self._op(
            f"{r:g} {g:g} {b:g} RG {width:g} w "
            f"{x1:g} {PAGE_H - y1:g} m {x2:g} {PAGE_H - y2:g} l S"
        )

    def build(self) -> bytes:
        # object layout: 1 catalog, 2 pages-tree, 3 /F1, 4 /F2, then for
        # page i: (5+2i) page object, (6+2i) its content stream
        n_pages = len(self._pages)
        page_ids = [5 + 2 * i for i in range(n_pages)]
        objs: dict[int, bytes] = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: (
                "<< /Type /Pages /Kids ["
                + " ".join(f"{pid} 0 R" for pid in page_ids)
                + f"] /Count {n_pages} >>"
            ).encode(),
            3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
            4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>",
        }
        for i, ops in enumerate(self._pages):
            pid = page_ids[i]
            stream = "\n".join(ops).encode("latin-1")
            objs[pid] = (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                f"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> "
                f"/Contents {pid + 1} 0 R >>"
            ).encode()
            objs[pid + 1] = (
                f"<< /Length {len(stream)} >>\nstream\n".encode()
                + stream
                + b"\nendstream"
            )
        out = bytearray(b"%PDF-1.4\n%\xc7\xec\x8f\xa2\n")
        offsets = {}
        for num in sorted(objs):
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
        xref_at = len(out)
        n_objs = max(objs) + 1
        out += f"xref\n0 {n_objs}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, n_objs):
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(out)
