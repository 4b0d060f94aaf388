"""URL handling: reference-faithful absolutization + engine canonicalization.

Two distinct operations, deliberately separate:

- ``absolutize(base, href)`` replicates the reference's M5 transform
  (reference ``DownloadLinks.scala:47-49``):
  ``uri.withPath(Uri.Path.unsafeFromString(p))`` over the *search* URL —
  keep the base's scheme + authority + query, replace ONLY the path with
  the raw href string. Bug-for-bug: if the href is itself a full URL,
  the whole string still becomes the path (http4s does not re-parse it).

- ``canonicalize(url)`` is engine-only (no reference analog): the
  identity under which the seen-filter dedups (north_rule
  "canonicalized+hashed URLs"): lowercase scheme+host, strip fragment,
  strip default port, resolve dot-segments, ensure non-empty path.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def absolutize(base_url: str, href: str) -> str:
    """Reference M5: replace the base URL's path with ``href``; keep the
    base's scheme, authority and query (http4s ``withPath`` keeps query;
    fragment is dropped by http4s URI parsing of the base)."""
    b = urlsplit(base_url)
    path = href if href.startswith("/") else "/" + href
    return urlunsplit((b.scheme, b.netloc, path, b.query, ""))


def canonicalize(url: str) -> str:
    """Engine canonical URL form (dedup identity)."""
    s = urlsplit(url.strip())
    scheme = s.scheme.lower()
    host = s.hostname.lower() if s.hostname else ""
    netloc = host
    if s.port is not None and str(s.port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{s.port}"
    path = _resolve_dots(s.path) or "/"
    return urlunsplit((scheme, netloc, path, s.query, ""))


def host_of(url: str) -> str:
    h = urlsplit(url).hostname
    return h.lower() if h else ""


def _resolve_dots(path: str) -> str:
    """RFC 3986 §5.2.4 remove-dot-segments."""
    if "." not in path:
        return path
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    if path.endswith(("/.", "/..")):
        out.append("")
    return "/".join(out)
