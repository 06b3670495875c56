"""Workbook discovery + fetch (SURVEY §2.1 S1/S2) — driver-side, network
access gated and fully unit-testable offline.

The reference scrapes an AIHW page for `tables-access.xlsx` links with
BeautifulSoup (/root/reference/main.py:25-39) and downloads workbook
bytes (/root/reference/main.py:139-140). Here link extraction is a pure
function over HTML text (regex; no bs4 dependency), and fetching is a
thin wrapper that callers inject a transport into — the engine never
performs implicit network I/O.
"""

from __future__ import annotations

import re
from collections.abc import Callable

# Reference constants (/root/reference/main.py:14-21).
ROOT_URL = "https://www.aihw.gov.au/reports-data/myhospitals/separations/tables"
FALLBACK_LINKS = [
    "https://www.aihw.gov.au/getmedia/04e116a4-f579-4cd5-bbaf-b3fa6256ea45/4-admitted-patient-care-2022-23-tables-access.xlsx",
]
LINK_SUFFIX = "tables-access.xlsx"
LINK_SUBSTR = "admitted-patient-care"
BASE = "https://www.aihw.gov.au"

_HREF_RE = re.compile(r"""<a\s[^>]*href\s*=\s*["']([^"']+)["']""", re.IGNORECASE)


def extract_links(html: str) -> list[str]:
    """S1 — collect `<a href>` targets ending with the workbook suffix and
    containing the report slug; absolute-ize site-relative paths
    (/root/reference/main.py:30-38)."""
    links: list[str] = []
    for href in _HREF_RE.findall(html or ""):
        if href.endswith(LINK_SUFFIX) and LINK_SUBSTR in href:
            links.append(BASE + href if href.startswith("/") else href)
    return links


def discover_excels(fetch: Callable[[str], str] | None = None) -> list[str]:
    """S1 — discover workbook URLs; fall back to the pinned link when the
    page is unreachable or yields nothing (/root/reference/main.py:25-39).

    `fetch(url) -> html` is injected; passing None skips the network
    entirely and returns the fallback."""
    html = ""
    if fetch is not None:
        try:
            html = fetch(ROOT_URL)
        except Exception:
            html = ""
    return extract_links(html) or list(FALLBACK_LINKS)


def sheet_name_wanted(name: str) -> bool:
    """S5 — only sheets matching `Table\\s*[45S]`, case-insensitive
    (/root/reference/main.py:143)."""
    return re.match(r"Table\s*[45S]", name, re.IGNORECASE) is not None


def excel_to_sheets(data: bytes) -> list[tuple[str, list[list[object]]]]:
    """S3/S4 — workbook bytes → [(sheet_name, raw rows)] for the wanted
    sheets, ready for sheet_ingest.parse_sheet. Requires openpyxl (import
    gated: absent in minimal containers, where tests skip)."""
    import io

    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError("openpyxl is required for Excel parsing") from e

    wb = openpyxl.load_workbook(io.BytesIO(data), read_only=True, data_only=True)
    out = []
    for name in wb.sheetnames:
        if not sheet_name_wanted(name):
            continue
        ws = wb[name]
        rows = [[c for c in row] for row in ws.iter_rows(values_only=True)]
        out.append((name, rows))
    return out
