"""URL canonicalization — pure Python, shared by engine and pyref oracle.

Implements SURVEY.md §2.1 C1 (RFC 3986 normalization, T-C):
lowercase scheme+host, strip default port & fragment, collapse dot-segments,
percent-decode unreserved characters (uppercase remaining escapes), sort query
params & drop tracking params, empty path → "/".

The Spark engine wraps :func:`canonicalize_url` in an Arrow-batched
``pandas_udf`` (engine/canonicalize.py); the pyref oracle calls it directly.
One function, two callers — guarantees identical URL-seen sets
(BASELINE.json:6) by construction.

No pyspark imports allowed in this module.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_TRACKING_EXACT = {"gclid", "fbclid", "msclkid", "ref"}


def _decode_unreserved(s: str) -> str:
    """Percent-decode unreserved chars; uppercase the hex of kept escapes."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n + 1 and i + 3 <= n:
            hx = s[i + 1 : i + 3]
            try:
                ch = chr(int(hx, 16))
            except ValueError:
                out.append(c)
                i += 1
                continue
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + hx.upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    if "." not in path:
        return path
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            if i == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:i])
                inp = inp[i:]
    return "".join(out)


def _norm_query(query: str) -> str:
    """Drop tracking params, sort the rest (lexicographic on 'k=v' pieces)."""
    if not query:
        return ""
    kept = []
    for piece in query.split("&"):
        if not piece:
            continue
        key = piece.split("=", 1)[0].lower()
        if key.startswith("utm_") or key in _TRACKING_EXACT:
            continue
        kept.append(_decode_unreserved(piece))
    kept.sort()
    return "&".join(kept)


def canonicalize_url(raw: str | None, base: str | None = None) -> str | None:
    """Canonical form of ``raw`` (resolved against ``base`` if relative).

    Returns None for unusable inputs (no host, non-http(s) scheme).
    """
    if raw is None:
        return None
    raw = raw.strip()
    if not raw:
        return None
    if base:
        raw = urljoin(base, raw)
    try:
        parts = urlsplit(raw)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    host, sep, port = netloc.partition(":")
    host = host.lower().rstrip(".")
    if not host:
        return None
    if sep and (port == _DEFAULT_PORTS.get(scheme) or port == ""):
        port = ""
        sep = ""
    path = _decode_unreserved(_remove_dot_segments(parts.path))
    if not path:
        path = "/"
    query = _norm_query(parts.query)
    out = scheme + "://" + host + (sep + port if sep else "") + path
    if query:
        out += "?" + query
    return out


def host_of(canonical_url: str) -> str:
    """Registrable host (lowercased, no port) of an already-canonical URL."""
    rest = canonical_url.split("://", 1)[1]
    netloc = rest.split("/", 1)[0].split("?", 1)[0]
    return netloc.partition(":")[0]


def path_of(canonical_url: str) -> str:
    """Path component (no query) of an already-canonical URL."""
    rest = canonical_url.split("://", 1)[1]
    slash = rest.find("/")
    if slash == -1:
        return "/"
    return rest[slash:].split("?", 1)[0]
