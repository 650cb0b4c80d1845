"""S12: SQA-summary export sinks — Zip-of-CSVs and an Excel workbook
(reference: physioview/dashboard/utils.py:374-420 ``_export_sqa`` and
688-776 ``_make_excel``/``_make_zip``).

The reference collects the per-session summary CSVs (SQA segment
table, IBI series, per-stream signal summaries) and packages them as
either a deflated ``.zip`` of the CSVs or one ``.xlsx`` workbook with
a sheet per frame. Its Excel path rides pandas.ExcelWriter/openpyxl;
this module re-expresses the same artifact contract on the standard
library only (an ``.xlsx`` IS a zip of SpreadsheetML XML parts), so
the engine has no optional-dependency edge for the one driver-side
export tail in SURVEY §2.

Semantics preserved from the reference:

- one sheet (or one CSV member) per named frame, written headers-first
  with no index column (``to_excel(..., index=False)``);
- sheet names truncated to Excel's 31-character limit
  (utils.py:733 ``sheet_name[:31]``), with the characters Excel
  rejects (``[]:*?/\\``) replaced by ``_`` — the reference never hits
  these because its stems are generated, but a library sink must not
  emit a workbook Excel refuses to open;
- frames longer than ``max_rows`` split into ``name_1``, ``name_2``,
  ... sheets (utils.py:724-733; default 1,000,000 rows like the
  reference — under Excel's 1,048,576 hard cap);
- an optional ``summary`` mapping becomes a two-column
  ``Quality Summary`` Metric/Value sheet (utils.py:706-715 parses the
  ``key: value`` quality txt into exactly that shape).

Scale shape: an export is a DOWNLOAD artifact, so this sink is
driver-side BY DESIGN — but it must not require the frame to fit in
driver memory. Rows stream through ``toLocalIterator`` (one partition
in flight) straight into the zip entry, so memory is bounded by one
partition regardless of frame length; the cluster-side cost is the
same jobs any collect of the frame would run. For frames a human will
open in a spreadsheet the input contract is the reference's: bounded
summary tables (segment metrics, IBI lists), not raw signal dumps.
"""

from __future__ import annotations

import math
import re
import zipfile
from collections.abc import Iterable, Iterator, Mapping

from pyspark.sql import DataFrame

_SHEET_BAD = re.compile(r"[\[\]:*?/\\]")
_XLSX_MAX_ROWS = 1_000_000
# XML 1.0 forbids C0 controls except \t \n \r, the noncharacters
# ￾/￿, and (unpaired) surrogates; a value containing e.g.
# \x01 must not reach a worksheet part verbatim (openpyxl raises
# IllegalCharacterError on the same class — this writer substitutes
# instead of silently emitting a part no parser accepts)
_XML_ILLEGAL = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff￾￿]")


def _sheet_name(name: str, part: int | None = None) -> str:
    """31-char, invalid-character-free sheet name; the split suffix
    survives truncation (``_2`` must not be cut off a long stem)."""
    clean = _SHEET_BAD.sub("_", name) or "Sheet"
    if part is None:
        return clean[:31]
    suffix = f"_{part}"
    return clean[: 31 - len(suffix)] + suffix


def _xml_escape(s: str) -> str:
    """Escape for BOTH element-text and attribute context (sheet names
    land inside ``name="..."`` in xl/workbook.xml, so ``"``/``'`` must
    be entity-escaped too), and strip the characters XML 1.0 forbids
    outright — they have no escaped form at all. ``\\t\\n\\r`` go out
    as numeric character references: parsers NORMALIZE the literal
    forms (CR -> LF in content; tab/LF/CR -> space in attributes), so
    only the references round-trip a multi-line cell value exactly
    (found by the Hypothesis round-trip property in
    tests/test_properties.py::TestExportEscaping)."""
    return _XML_ILLEGAL.sub(
        "�",
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;").replace("'", "&apos;")
        .replace("\t", "&#9;").replace("\n", "&#10;")
        .replace("\r", "&#13;"))


def _csv_field(x) -> str:
    if x is None:
        return ""
    s = str(x)
    if any(c in s for c in ",\"\n\r"):
        return '"' + s.replace('"', '""') + '"'
    return s


def _iter_rows(df: DataFrame) -> Iterator[tuple]:
    for row in df.toLocalIterator():
        yield tuple(row)


def export_zip(
    frames: Mapping[str, DataFrame],
    path: str,
) -> list[str]:
    """Deflated zip with one ``<name>.csv`` member per frame
    (reference ``_make_zip`` / the ``type == 'zip'`` branch of
    ``_export_sqa``). Returns the member names written. Rows stream
    partition-by-partition; the driver never holds a whole frame."""
    members: list[str] = []
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, df in frames.items():
            member = f"{name}.csv"
            with zf.open(member, "w") as raw:
                raw.write(
                    (",".join(_csv_field(c) for c in df.columns) + "\r\n")
                    .encode("utf-8"))
                for row in _iter_rows(df):
                    raw.write(
                        (",".join(_csv_field(x) for x in row) + "\r\n")
                        .encode("utf-8"))
            members.append(member)
    return members


def _write_sheet(zf: zipfile.ZipFile, idx: int, header: list[str],
                 rows: Iterable[tuple]) -> None:
    """Stream one worksheet part. Numbers go out as native numeric
    cells, everything else as inline strings (no sharedStrings table
    — inline keeps the writer single-pass and streaming)."""
    with zf.open(f"xl/worksheets/sheet{idx}.xml", "w") as raw:
        w = raw.write
        w(b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n')
        w(b'<worksheet xmlns="http://schemas.openxmlformats.org/'
          b'spreadsheetml/2006/main"><sheetData>')
        w(b"<row>")
        for h in header:
            w(('<c t="inlineStr"><is><t xml:space="preserve">%s</t>'
               "</is></c>" % _xml_escape(str(h))).encode("utf-8"))
        w(b"</row>")
        for row in rows:
            w(b"<row>")
            for x in row:
                # NaN AND +/-inf become empty cells: inf is well-formed
                # XML but invalid SpreadsheetML numeric content (Excel
                # flags the workbook for repair)
                if x is None or (isinstance(x, float)
                                 and not math.isfinite(x)):
                    w(b"<c/>")
                elif isinstance(x, bool):
                    w(b'<c t="b"><v>1</v></c>' if x
                      else b'<c t="b"><v>0</v></c>')
                elif isinstance(x, (int, float)):
                    w(f"<c><v>{x!r}</v></c>".encode("utf-8"))
                else:
                    w(('<c t="inlineStr"><is><t xml:space="preserve">'
                       "%s</t></is></c>" % _xml_escape(str(x)))
                      .encode("utf-8"))
            w(b"</row>")
        w(b"</sheetData></worksheet>")


def export_excel(
    frames: Mapping[str, DataFrame],
    path: str,
    max_rows: int = _XLSX_MAX_ROWS,
    summary: Mapping[str, str] | None = None,
) -> list[str]:
    """One ``.xlsx`` workbook, one sheet per frame (reference
    ``_make_excel``): sheet = frame name (31-char cap, invalid chars
    replaced), frames over ``max_rows`` rows split into ``name_1``,
    ``name_2``, ...; ``summary`` adds a leading two-column
    ``Quality Summary`` sheet. Returns the sheet names written.

    Implementation note: the workbook is written as streamed
    SpreadsheetML parts inside a stdlib zip — no openpyxl/xlsxwriter
    dependency — and each frame streams through ``toLocalIterator``;
    the split bound is enforced while streaming, so a frame is never
    materialized to count it first."""
    if max_rows < 1:
        raise ValueError(f"max_rows must be >= 1, got {max_rows}")
    sheets: list[str] = []  # final names, in workbook order
    seen: set[str] = set()

    def add_sheet(name: str) -> None:
        # fail BEFORE more parts are streamed: two 31-char-truncated
        # stems colliding would otherwise produce a workbook Excel
        # rejects at open time
        if name in seen:
            raise ValueError(
                f"duplicate sheet name after truncation: {name!r}")
        seen.add(name)
        sheets.append(name)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        if summary is not None:
            add_sheet("Quality Summary")
            _write_sheet(zf, 1, ["Metric", "Value"],
                         ((str(k), str(v)) for k, v in summary.items()))
        for name, df in frames.items():
            header = list(df.columns)
            # stream + split: buffer at most max_rows rows at a time,
            # look one row ahead to decide whether the split suffix is
            # needed at all (a <=max_rows frame keeps its bare name,
            # reference utils.py:733)
            it = _iter_rows(df)
            chunk: list[tuple] = []
            first_overflow = None
            for row in it:
                chunk.append(row)
                if len(chunk) == max_rows:
                    try:
                        first_overflow = next(it)
                    except StopIteration:
                        first_overflow = None
                    break
            if first_overflow is None and len(chunk) <= max_rows:
                add_sheet(_sheet_name(name))
                _write_sheet(zf, len(sheets), header, chunk)
                continue
            # multi-sheet path: write the buffered chunk, then keep
            # streaming max_rows at a time
            part = 1
            add_sheet(_sheet_name(name, part))
            _write_sheet(zf, len(sheets), header, chunk)
            chunk = [first_overflow]
            for row in it:
                chunk.append(row)
                if len(chunk) == max_rows:
                    part += 1
                    add_sheet(_sheet_name(name, part))
                    _write_sheet(zf, len(sheets), header, chunk)
                    chunk = []
            if chunk:
                part += 1
                add_sheet(_sheet_name(name, part))
                _write_sheet(zf, len(sheets), header, chunk)
        # workbook plumbing: content types, package rels, workbook,
        # workbook rels — all tiny, written after the sheets exist
        n = len(sheets)
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument'
            '.spreadsheetml.worksheet+xml"/>'
            for i in range(1, n + 1))
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/'
            '2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.sheet.main+xml"/>'
            f"{overrides}</Types>")
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/'
            'officeDocument" Target="xl/workbook.xml"/></Relationships>')
        sheet_tags = "".join(
            f'<sheet name="{_xml_escape(s)}" sheetId="{i}" r:id="rId{i}"/>'
            for i, s in enumerate(sheets, 1))
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>")
        rels = "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/'
            f'worksheet" Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, n + 1))
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">{rels}</Relationships>')
    return sheets
