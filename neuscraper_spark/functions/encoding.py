"""F2 — encoding sniff + fallback decode for raw page bytes.

Reference behaviour: try utf-8, else ask a charset detector, give up
when it can't tell (app/builder.py:110-122; src/warc/build.py:69-71,
124-131 uses chardet). chardet doesn't ship in this sandbox, so the
public-standard equivalent chain is:

    BOM sniff -> strict utf-8 -> <meta charset=...> declaration ->
    latin-1 (which decodes any byte string)

with a binary guard: NUL bytes in the head mean a non-text payload —
the reference's give-up branch. latin-1 as the tail matters on real
Common Crawl: an utf-8-only strict decode silently drops every
latin-1/windows-1252 page the reference keeps.

One pure function shared by every Spark parse stage AND the
single-process oracle, so keep/drop decisions can't diverge between
engines.
"""

from __future__ import annotations

import re

_META_CHARSET_RE = re.compile(rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_.:\-]+)""", re.I)
_SNIFF_BYTES = 2048


def decode_html(raw: bytes | str | None) -> str | None:
    """Bytes -> text via the F2 fallback chain; None = drop the page."""
    if raw is None:
        return None
    if isinstance(raw, str):
        return raw
    b = bytes(raw)
    if b.startswith(b"\xef\xbb\xbf"):
        try:
            return b[3:].decode("utf-8")
        except UnicodeDecodeError:
            pass
    if b.startswith(b"\xff\xfe") or b.startswith(b"\xfe\xff"):
        try:
            return b.decode("utf-16")
        except UnicodeDecodeError:
            return None
    if b"\x00" in b[:_SNIFF_BYTES]:
        return None  # binary payload — the reference's give-up branch
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        pass
    m = _META_CHARSET_RE.search(b[:_SNIFF_BYTES])
    if m:
        name = m.group(1).decode("ascii", "ignore").lower()
        if name not in ("utf-8", "utf8"):
            try:
                return b.decode(name)
            except (UnicodeDecodeError, LookupError):
                pass
    return b.decode("latin-1")
