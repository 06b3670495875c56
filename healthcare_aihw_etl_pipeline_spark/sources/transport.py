"""Real HTTP transport for S1/S2 — EXPLICIT opt-in only.

The reference performs live network I/O inline (requests.get at
/root/reference/main.py:27,139). This engine keeps every query path
offline by default — discovery/fetch take injected callables
(sources/discovery.py) — and this module supplies the one sanctioned
real implementation for users who want the reference's online behavior.
Nothing imports it implicitly; callers must either pass
``allow_network=True`` here or set ``SPARK_GRAFT_ALLOW_NETWORK=1``,
so a test suite or an air-gapped deployment can never be surprised by
a socket. stdlib urllib is used (requests isn't a dependency of this
engine); the transport is driver-side only — workbook bytes are small,
and everything distributed happens after parse.
"""

from __future__ import annotations

import os
from collections.abc import Callable

_OPT_IN_ENV = "SPARK_GRAFT_ALLOW_NETWORK"
_USER_AGENT = "healthcare-aihw-etl-pipeline-spark/1.0"


class NetworkNotAllowed(RuntimeError):
    """Raised when a network transport is requested without opt-in."""


def _check_opt_in(allow_network: bool) -> None:
    if allow_network or os.environ.get(_OPT_IN_ENV) == "1":
        return
    raise NetworkNotAllowed(
        "network access is off by default; pass allow_network=True or "
        f"set {_OPT_IN_ENV}=1 to enable the HTTP transport"
    )


def _urlopen(url: str, timeout: float):
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": _USER_AGENT})
    return urllib.request.urlopen(req, timeout=timeout)  # noqa: S310


def http_fetch_text(
    url: str, *, timeout: float = 30.0, allow_network: bool = False
) -> str:
    """S1 transport — fetch a page's HTML (reference main.py:27)."""
    _check_opt_in(allow_network)
    with _urlopen(url, timeout) as resp:
        charset = resp.headers.get_content_charset() or "utf-8"
        return resp.read().decode(charset, errors="replace")


def http_fetch_bytes(
    url: str, *, timeout: float = 60.0, allow_network: bool = False
) -> bytes:
    """S2 transport — fetch binary workbook bytes (reference
    main.py:139-140)."""
    _check_opt_in(allow_network)
    with _urlopen(url, timeout) as resp:
        return resp.read()


def default_transports(
    *, allow_network: bool = False, timeout: float = 30.0
) -> tuple[Callable[[str], str], Callable[[str], bytes]]:
    """(fetch_html, fetch_bytes) pair ready to hand to
    :func:`pipeline.run_etl` — the reference's online flow with the
    opt-in checked ONCE up front (so a pipeline fails fast at
    construction, not mid-run on the first fetch)."""
    _check_opt_in(allow_network)

    def fetch_html(url: str) -> str:
        return http_fetch_text(url, timeout=timeout, allow_network=True)

    def fetch_bytes(url: str) -> bytes:
        return http_fetch_bytes(url, timeout=timeout, allow_network=True)

    return fetch_html, fetch_bytes
