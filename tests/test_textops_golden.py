"""Golden tests ported verbatim from the reference's Go test suites.

Sources:
* crawler/text_extractor_test.go:13-44
* crawler/link_extractor_test.go:20-210
* crawler/crawler_integration_test.go:23-41,74-90
"""

from go_crawler_spark.functions.textops import extract_text, extract_title
from go_crawler_spark.functions.urlops import (
    canonicalize_url,
    extract_links,
    is_private_host,
    resolve_url,
)


def test_content_extractor():
    content = '<div>Some<span> text</span> example &amp; test</div>\n<buttton>Search</button>\n'
    assert extract_title(content) == ""
    assert extract_text(content) == "Some text example & test Search"


def test_content_extractor_with_title():
    content = (
        "<html>\n<head>\n<title>Test title</title>\n</head>\n<body>\n"
        "<div>Some<span> content</span></div>\n</body>\n</html>\n"
    )
    assert extract_title(content) == "Test title"
    assert extract_text(content) == "Some content"


# --- resolveURL goldens (link_extractor_test.go:20-79) ---------------------

RESOLVE_CASES = [
    ("/bar/baz", "http://example.com/foo/", "http://example.com/bar/baz"),
    ("bar/baz", "http://example.com/foo/", "http://example.com/foo/bar/baz"),
    ("./bar/baz", "http://example.com/foo/secret/", "http://example.com/foo/secret/bar/baz"),
    ("./bar/baz", "http://example.com/foo/secret", "http://example.com/foo/bar/baz"),
    ("../../bar/baz", "http://example.com/foo/secret/", "http://example.com/bar/baz"),
    ("//www.somewhere.com/foo", "http://example.com/bar/secret/", "http://www.somewhere.com/foo"),
    ("//www.somewhere.com/foo", "https://example.com/bar/secret/", "https://www.somewhere.com/foo"),
]


def test_resolve_url_goldens():
    for target, base, exp in RESOLVE_CASES:
        assert resolve_url(base, target) == exp, (target, base)


def test_resolve_url_empty_target():
    assert resolve_url("http://example.com/", "") is None


# --- linkExtractor goldens (link_extractor_test.go:85-210) -----------------


def test_link_extractor_basic():
    content = """
<html>
<body>
<a href="https://example.com"/>
<a href="//foo.com"></a>
<a href="/absolute/link"></a>
<!-- the following link should be included in the no follow link list -->
<a href="./local" rel="nofollow"></a>
<!-- duplicates, even with fragments should be skipped -->
<a href="https://example.com#important"/>
<a href="//foo.com"></a>
<a href="/absolute/link#some-anchor"></a>
</body>
</html>
"""
    follow, nofollow = extract_links("http://test.com", content)
    assert sorted(follow) == [
        "http://foo.com",
        "http://test.com/absolute/link",
        "https://example.com",
    ]
    assert nofollow == ["http://test.com/local"]


def test_link_extractor_non_http():
    content = '<html><body><a href="ftp://example.com">An FTP site</a></body></html>'
    assert extract_links("http://test.com", content) == ([], [])


def test_link_extractor_relative_to_file():
    content = """
<html>
<body>
<a href="./foo.html">link to foo</a>
<a href="../private/data.html">login required</a>
</body>
</html>
"""
    follow, _ = extract_links("https://test.com/content/intro.html", content)
    assert sorted(follow) == [
        "https://test.com/content/foo.html",
        "https://test.com/private/data.html",
    ]


def test_link_extractor_relative_to_dir():
    content = """
<html>
<body>
<a href="./foo.html">link to foo</a>
<a href="../private/data.html">login required</a>
</body>
</html>
"""
    follow, _ = extract_links("https://test.com/content/", content)
    assert sorted(follow) == [
        "https://test.com/content/foo.html",
        "https://test.com/private/data.html",
    ]


def test_link_extractor_with_base_tag():
    content = """
<html>
<head>
<base href="https://test.com/base/"/>
</head>
<body>
<a href="./foo.html">link to foo</a>
<a href="../private/data.html">login required</a>
</body>
</html>
"""
    follow, _ = extract_links("https://test.com/content/", content)
    assert sorted(follow) == [
        "https://test.com/base/foo.html",
        "https://test.com/private/data.html",
    ]


def test_link_extractor_private_network():
    content = """
<html>
<body>
<a href="https://example.com">link to foo</a>
<a href="http://169.254.169.254/api/credentials"/>
</body>
</html>
"""
    follow, nofollow = extract_links("https://test.com/content/", content)
    assert follow == ["https://example.com"]
    assert nofollow == []


# --- integration-test page (crawler_integration_test.go:23-41) -------------

SERVER_RES = """
\t<html>
\t<head>
\t  <title>A title</title>
\t  <base href="http://google.com/"/>
\t</head>
\t<body>
\t  <a href="./relative">I am a link relative to base</a>
\t  <a href="/absolute/path">I am an absolute link</a>
\t  <a href="//images/cart.png">I am using the same URL scheme as this page</a>
\t
\t  <!-- Link should be added to the index but without creating an edge to it -->
\t  <a href="ignore-me" rel="nofollow"/>
\t  <!-- The following links should be ignored -->
\t  <a href="file:///etc/passwd"></a>
\t  <a href="http://169.254.169.254/api/credentials">Link-local address</a>
\t</body>
\t</html>"""


def test_integration_page_extraction():
    assert extract_title(SERVER_RES) == "A title"
    assert extract_text(SERVER_RES) == (
        "I am a link relative to base I am an absolute link "
        "I am using the same URL scheme as this page Link-local address"
    )
    follow, nofollow = extract_links("http://127.0.0.1:9999", SERVER_RES)
    assert sorted(follow) == [
        "http://google.com/absolute/path",
        "http://google.com/relative",
    ]
    assert nofollow == ["http://google.com/ignore-me"]


# --- privnet (privnet.go:6-22) ---------------------------------------------


def test_privnet():
    assert is_private_host("169.254.169.254")
    assert is_private_host("127.0.0.1")
    assert is_private_host("10.1.2.3")
    assert is_private_host("172.17.0.1")
    assert is_private_host("192.168.1.1")
    assert not is_private_host("8.8.8.8")
    assert not is_private_host("example.com")
    assert is_private_host("evil.internal", dns={"evil.internal": "10.0.0.5"})


def test_privnet_fail_closed():
    """Reference semantics (privnet.go:62-75): a named host the resolver
    cannot resolve is DROPPED (fail closed), behind the flag."""
    assert is_private_host("unresolvable.host", unresolved_private=True)
    # resolvable / literal hosts unaffected by the flag
    assert not is_private_host("8.8.8.8", unresolved_private=True)
    assert not is_private_host(
        "ok.host", dns={"ok.host": "8.8.8.8"}, unresolved_private=True
    )
    assert is_private_host(
        "evil.internal", dns={"evil.internal": "10.0.0.5"}, unresolved_private=True
    )
    # extract_links: cross-host named link dropped in fail-closed mode,
    # same-host shortcut (F6) still retains
    html = (
        '<a href="http://other.test/x">cross</a>'
        '<a href="/same">same-host</a>'
    )
    follow, _ = extract_links("http://me.test/", html, unresolved_private=True)
    assert follow == ["http://me.test/same"]
    follow_open, _ = extract_links("http://me.test/", html)
    assert follow_open == ["http://other.test/x", "http://me.test/same"]


def test_privnet_live_resolver_hook():
    """A pluggable resolver (socket.gethostbyname in production) drives
    privnet for named hosts; resolution ERROR fails closed — the link is
    dropped — exactly privnet.go:62-75."""
    table = {"public.test": "93.184.216.34", "hidden.test": "192.168.7.7"}

    def resolve(h):
        if h == "broken.test":
            raise OSError("NXDOMAIN")
        return table.get(h)  # None for unknown hosts

    assert not is_private_host("public.test", resolver=resolve)
    assert is_private_host("hidden.test", resolver=resolve)  # resolves private
    assert is_private_host("broken.test", resolver=resolve)  # error => closed
    assert is_private_host("unknown.test", resolver=resolve)  # None => closed
    # IP literals never consult the resolver
    assert not is_private_host("8.8.8.8", resolver=resolve)
    assert is_private_host("10.0.0.1", resolver=resolve)
    # static map takes precedence; resolver covers the misses
    assert is_private_host(
        "evil.internal", dns={"evil.internal": "10.0.0.5"}, resolver=resolve
    )
    # end-to-end: extract_links drops the unresolvable cross-host link,
    # keeps the resolvable-public one and the same-host shortcut
    html = (
        '<a href="http://broken.test/x">err</a>'
        '<a href="http://public.test/y">ok</a>'
        '<a href="/same">same-host</a>'
    )
    follow, _ = extract_links("http://me.test/", html, resolver=resolve)
    assert follow == ["http://public.test/y", "http://me.test/same"]


def test_canonicalize_url():
    assert canonicalize_url("http://a.com/p#frag") == "http://a.com/p"
    assert canonicalize_url("ftp://a.com/p") is None
    assert canonicalize_url("https://a.com/p?q=1#x") == "https://a.com/p?q=1"


def test_fast_strip_tags_differential():
    """The single-regex scanner must match the html.parser reference on
    the golden page, the synthetic corpus, and adversarial compositions."""
    import random

    from go_crawler_spark import fixtures
    from go_crawler_spark.functions.textops import _strip_tags, _strip_tags_ref

    assert _strip_tags(fixtures.GOLDEN_SERVER_RES) == _strip_tags_ref(
        fixtures.GOLDEN_SERVER_RES
    )
    for i in range(0, 5000, 13):
        c = fixtures._page_row(i, 100000, 50, 0.4, 10)["html"].decode()
        assert _strip_tags(c) == _strip_tags_ref(c), f"corpus page {i}"

    random.seed(7)
    frags = [
        "<p>", "</p>", "text & more", "<script>var x='</div>';</script>",
        "<style>a{}</style>", "<!-- <p>c</p> -->", "<title>T&amp;t</title>",
        "&amp;#10;", "<a href='x'>l</a>", "<br/>", "<SCRIPT>s</SCRIPT>",
        "< notag", "<3 hearts", "</ p>", "<![CDATA[x]]>", "<!DOCTYPE html>",
        "<?php x ?>", "&lt;tag&gt;", "\n\t spaces  ",
        '<div class="a>b">q</div>', "<iframe>inner</iframe>",
        "<noscript><p>ns</p></noscript>", "<b", "plain",
    ]
    for _ in range(1500):
        doc = "".join(random.choice(frags) for _ in range(random.randint(1, 12)))
        assert _strip_tags(doc) == _strip_tags_ref(doc), repr(doc)


def test_fast_resolve_url_differential():
    """resolve_url's shortcuts must equal the full urljoin path."""
    from urllib.parse import urljoin, urlsplit

    from go_crawler_spark.functions.urlops import resolve_url

    def ref(base, target):
        if not target:
            return None
        if target.startswith("//"):
            target = f"{urlsplit(base).scheme}:{target}"
        try:
            return urljoin(base, target)
        except ValueError:
            return None

    bases = [
        "http://host5.test/p/12", "http://a.test/", "https://x.org/d/p?q=1",
        "http://google.com/", "http://h.test",
    ]
    targets = [
        "", "/p/5", "/p/5?x=1", "//host2.test/p/9", "http://b.test/q/1",
        "p/7", "./rel", "../up", "/a/./b", "/a/../b", "http://x.com",
        "http://x.com/", "http://x.com/p.html", "/static/logo.png",
        "ftp://files.test/x", "#frag", "/p/5#sec", "http://x.com/p/1#s",
        "mailto:a@b", "  /sp", "/double//slash", "http://x.com//dbl",
        "/q?a=b&c=d", "http://u:p@h.test/x", "/%20enc", "http://x.com/%7e",
    ]
    for b in bases:
        for t in targets:
            assert resolve_url(b, t) == ref(b, t), (b, t)


def test_fast_scanner_selfclose_and_junk_endtags():
    """Review r3 goldens: XHTML self-closing skip tags must not swallow
    the document; end tags with attr junk are real end tags."""
    from go_crawler_spark.functions.textops import _strip_tags, _strip_tags_ref

    cases = [
        "<object/>Hello world",
        "<script/>Hello world",
        "a<iframe/>bcd",
        'a</div class="x">b',
        "<title>t</title foo>after",
        "<a href=a/b>x</a>",
        "<object>skip<param/></object>visible",
    ]
    for c in cases:
        assert _strip_tags(c) == _strip_tags_ref(c), c
    assert _strip_tags("<object/>Hello world") == "Hello world"
