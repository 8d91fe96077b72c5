"""URL canonicalization, Go-compatible resolution, link regexes, privnet.

Pure-Python reimplementation of the reference's URL handling:

* ``resolve_url``       — crawler/link_extractor.go:105-128 (Go
  ``url.ResolveReference`` via RFC 3986; golden-tested against
  crawler/link_extractor_test.go:20-79).
* ``extract_links``     — crawler/link_extractor.go:31-77 (regex link scan,
  <base> handling, nofollow split, per-page dedup, scheme/privnet/extension
  filters, fragment strip).
* ``is_private_host``   — crawler/privnet/privnet.go:6-75 (identical CIDR
  list).  Named hosts resolve through an optional static mapping and/or a
  pluggable ``resolver`` callable (``socket.gethostbyname`` in a real
  deployment).  With a resolver wired in, resolution error fails CLOSED
  (link dropped) exactly like the reference; without one, the sandbox
  default is fail-open (every named test host would otherwise drop),
  flippable via ``unresolved_private``.
* ``canonicalize_url``  — service/frontend/frontend.go:180-188 (seed
  ingestion: parse, http(s)-only, strip fragment).

Spark-side keys use ``xxhash64(url)`` (64-bit, collision-safe at 10^10 URLs
where a 32-bit murmur3 would collide constantly).
"""

from __future__ import annotations

import ipaddress
import re
from typing import Callable
from urllib.parse import urljoin, urlsplit, urlunsplit

from pyspark.sql import Column
import pyspark.sql.functions as F

# Reference: crawler/link_fetcher.go:14
EXCLUSION_RE = re.compile(r"\.(?:jpg|jpeg|png|gif|ico|css|js)$", re.IGNORECASE)
# Reference: crawler/link_extractor.go:12-14 (Go `.` does not match \n).
BASE_HREF_RE = re.compile(r'<base.*?href\s*?=\s*?"(.*?)\s*?"', re.IGNORECASE)
FIND_LINK_RE = re.compile(r'<a.*?href\s*?=\s*?"\s*?(.*?)\s*?".*?>', re.IGNORECASE)
NOFOLLOW_RE = re.compile(r'rel\s*?=\s*?"?nofollow"?', re.IGNORECASE)

# Reference: crawler/privnet/privnet.go:6-22 — identical list.
PRIVATE_CIDRS = [
    "127.0.0.0/8",
    "::1/128",
    "10.0.0.0/8",
    "172.16.0.0/12",
    "192.168.0.0/16",
    "169.254.0.0/16",
    "fe80::/10",
    "0.0.0.0/8",
    "255.255.255.255/32",
    "fc00::/7",
]
_PRIVATE_NETS = [ipaddress.ip_network(c) for c in PRIVATE_CIDRS]


def is_private_host(
    host: str,
    dns: dict[str, str] | None = None,
    unresolved_private: bool = False,
    resolver: "Callable[[str], str | None] | None" = None,
) -> bool:
    """True if host is an IP literal (or resolvable) inside the
    reference's private CIDR list.

    ``resolver`` is a live DNS hook — ``socket.gethostbyname`` in a real
    deployment — consulted for named hosts the static ``dns`` map misses.
    When a resolver is wired in, resolution FAILURE (exception or None)
    fails CLOSED (treated private, link dropped), exactly the reference's
    behavior of dropping links on DNS error (crawler/privnet/privnet.go:
    62-75).  ``unresolved_private`` selects the fail mode when there is NO
    resolver: the default False (fail open) matches the no-DNS sandbox
    where every named test host would otherwise be dropped.
    """
    if not host:
        return False
    if dns is None and resolver is None:
        return _is_private_host_cached(host, unresolved_private)
    return _is_private_host_uncached(host, dns, unresolved_private, resolver)


def _is_private_host_uncached(host, dns, unresolved_private, resolver=None):  # noqa: ANN001
    h = host.strip("[]")
    if dns and h in dns:
        h = dns[h]
    try:
        ip = ipaddress.ip_address(h)
    except ValueError:
        if resolver is not None:
            # live DNS: resolution error => fail closed (drop the link)
            try:
                resolved = resolver(h)
            except Exception:
                return True
            if resolved is None:
                return True
            try:
                ip = ipaddress.ip_address(resolved)
            except ValueError:
                return True
        else:
            return unresolved_private  # named host, no resolver wired in
    return any(ip in net for net in _PRIVATE_NETS)


from functools import lru_cache


@lru_cache(maxsize=65536)
def _is_private_host_cached(host: str, unresolved_private: bool) -> bool:
    return _is_private_host_uncached(host, None, unresolved_private)


@lru_cache(maxsize=65536)
def _hostname(netloc_url: str) -> str:
    """Go url.Hostname(): strip port and IPv6 brackets, preserve case."""
    host = urlsplit(netloc_url).netloc
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    if host.startswith("["):
        return host[1 : host.find("]")]
    return host.rsplit(":", 1)[0] if re.search(r":\d*$", host) else host


# Fast-path guards: anything that could need RFC 3986 dot-segment
# normalization or odd parsing falls back to the exact urljoin path.
_SIMPLE_PATH_RE = re.compile(r"^/(?:[^/.?#\\]+/)*[^/.?#\\]*(?:\?[^#]*)?$")
_SIMPLE_ABS_RE = re.compile(
    r"^https?://[^/?#\\]+(?:/(?:[^/.?#\\]+/)*[^/.?#\\]*)?(?:\?[^#]*)?$"
)


@lru_cache(maxsize=65536)
def _split_base(base: str) -> tuple[str, str]:
    s = urlsplit(base)
    return s.scheme, s.netloc


def resolve_url(base: str, target: str) -> str | None:
    """Go resolveURL semantics: '' -> None; '//x' inherits base scheme;
    everything else RFC 3986 reference resolution against ``base``.

    Hot-path shortcuts (differential-tested against urljoin in
    tests/test_textops_golden.py): already-absolute http(s) targets and
    host-absolute paths with no dot segments resolve without the full
    urljoin machinery — per-page link resolution is ~40% of extraction
    CPU at crawl scale.
    """
    if not target:
        return None
    if target.startswith("//"):
        scheme = urlsplit(base).scheme
        target = f"{scheme}:{target}"
    if _SIMPLE_ABS_RE.match(target):
        return target
    if _SIMPLE_PATH_RE.match(target):
        scheme, netloc = _split_base(base)
        if scheme and netloc:
            return f"{scheme}://{netloc}{target}"
    try:
        return urljoin(base, target)
    except ValueError:
        return None


def strip_fragment(url: str) -> str:
    # fast path: nothing to strip and the split/unsplit round-trip is the
    # identity (a lone trailing '?' is the one case unsplit normalizes)
    if "#" not in url and not url.endswith("?"):
        return url
    s = urlsplit(url)
    return urlunsplit((s.scheme, s.netloc, s.path, s.query, ""))


def ensure_trailing_slash(s: str) -> str:
    return s if s.endswith("/") else s + "/"


def canonicalize_url(url: str) -> str | None:
    """Seed canonicalization: parseable, http(s) scheme, fragment stripped."""
    try:
        s = urlsplit(url.strip())
    except ValueError:
        return None
    if s.scheme not in ("http", "https"):
        return None
    return urlunsplit((s.scheme, s.netloc, s.path, s.query, ""))


def extract_links(
    page_url: str,
    content: str,
    dns: dict[str, str] | None = None,
    unresolved_private: bool = False,
    resolver: Callable[[str], str | None] | None = None,
) -> tuple[list[str], list[str]]:
    """(follow_links, nofollow_links) with the reference's exact pipeline:

    base-tag resolution -> regex scan -> resolve -> retain (scheme,
    same-host shortcut, privnet) -> fragment strip -> per-page dedup ->
    extension exclusion -> nofollow split.
    """
    rel_to = page_url
    m = BASE_HREF_RE.search(content)
    if m:
        base = resolve_url(rel_to, ensure_trailing_slash(m.group(1)))
        if base:
            rel_to = base
    src_host = _hostname(rel_to)

    follow: list[str] = []
    nofollow: list[str] = []
    seen: set[str] = set()
    for tag_match in FIND_LINK_RE.finditer(content):
        link = resolve_url(rel_to, tag_match.group(1))
        if not _retain_link(src_host, link, dns, unresolved_private, resolver):
            continue
        link = strip_fragment(link)
        if link in seen:
            continue
        if EXCLUSION_RE.search(link):
            continue
        seen.add(link)
        if NOFOLLOW_RE.search(tag_match.group(0)):
            nofollow.append(link)
        else:
            follow.append(link)
    return follow, nofollow


def _retain_link(src_host: str, link: str | None, dns, unresolved_private=False, resolver=None) -> bool:  # noqa: ANN001
    if not link:
        return False
    head = link[:8].lower()  # scheme check sans urlsplit (it lowercases)
    if not (head.startswith("http://") or head.startswith("https://")):
        return False
    host = _hostname(link)
    if host == src_host:
        return True
    return not is_private_host(host, dns, unresolved_private, resolver)


# ---------------------------------------------------------------------------
# Spark column helpers (JVM-side; no Python in the hot path)
# ---------------------------------------------------------------------------


def url_hash_col(url: Column | str) -> Column:
    """64-bit key of a canonical URL — the engine's join/partition key."""
    return F.xxhash64(F.col(url) if isinstance(url, str) else url)


def host_col(url: Column | str) -> Column:
    """Lowercased hostname — NULL-safe (``try_parse_url``): a malformed
    URL yields NULL instead of failing the job under ANSI.  The crawl
    canonicalizes URLs before this runs, but discovered links and the
    corpus-layer URL gate see arbitrary strings; one shared definition
    keeps the frontier's host and the blocklist's host in agreement."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.try_parse_url(c, F.lit("HOST")))


def path_col(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.parse_url(c, F.lit("PATH"))


def scheme_col(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))


def excluded_extension_col(url: Column | str) -> Column:
    """F1: native rlike for the non-HTML extension filter.

    Built from EXCLUSION_RE.pattern — ONE source of truth, so adding an
    extension cannot silently diverge the Python extraction path from
    the Spark filter."""
    c = F.col(url) if isinstance(url, str) else url
    return c.rlike("(?i)" + EXCLUSION_RE.pattern)
