"""Property-based tests (hypothesis) for the pure kernels.

The reference has no property tests (SURVEY §5); these guard the pure
functions whose edge cases matter most at 10^10 inputs: URL resolution,
canonicalization, text extraction, and the Bloom bit math.
"""

import string

import numpy as np
from hypothesis import given, settings, strategies as st

from go_crawler_spark.functions.textops import extract_text
from go_crawler_spark.functions.urlops import (
    canonicalize_url,
    extract_links,
    resolve_url,
    strip_fragment,
)
from go_crawler_spark.operators.seen import _bit_positions, bloom_params

hosts = st.from_regex(r"[a-z]{1,10}\.(com|test|org)", fullmatch=True)
paths = st.from_regex(r"(/[a-z0-9._~-]{0,8}){0,4}/?", fullmatch=True)
bases = st.builds(lambda h, p: f"http://{h}{p}", hosts, paths)
targets = st.one_of(
    paths,
    st.from_regex(r"[a-z0-9._-]{1,10}", fullmatch=True),
    st.builds(lambda h, p: f"//{h}{p}", hosts, paths),
    st.builds(lambda h, p: f"https://{h}{p}", hosts, paths),
)


@settings(max_examples=300, deadline=None)
@given(base=bases, target=targets)
def test_resolve_url_total_and_absolute(base, target):
    """Resolution never raises; non-empty targets resolve to http(s) URLs."""
    out = resolve_url(base, target)
    if target:
        assert out is None or out.startswith(("http://", "https://"))


@settings(max_examples=300, deadline=None)
@given(base=bases)
def test_resolve_idempotent_on_absolute(base):
    assert resolve_url("http://other.test/x", base) == base


@settings(max_examples=200, deadline=None)
@given(url=st.builds(lambda b, f: b + "#" + f, bases,
                     st.text(alphabet=string.ascii_lowercase, max_size=8)))
def test_canonicalize_strips_fragment(url):
    c = canonicalize_url(url)
    assert c is not None and "#" not in c
    assert strip_fragment(url) == c


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_extract_text_total_and_trimmed(content):
    """Any input: no exception, no leading/trailing ASCII whitespace,
    no angle-bracket tags surviving a well-formed strip."""
    out = extract_text(content)
    assert out == out.strip()


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=string.printable, max_size=300))
def test_extract_links_total(content):
    follow, nofollow = extract_links("http://base.test/dir/", content)
    for link in follow + nofollow:
        assert link.startswith(("http://", "https://"))
        assert "#" not in link


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=1, max_size=200, unique=True),
    st.integers(min_value=10, max_value=10_000),
)
def test_bloom_bit_positions_in_range(keys, capacity):
    m, k = bloom_params(capacity, 0.01)
    pos = _bit_positions(np.array(keys, dtype=np.int64), k, m)
    assert pos.shape == (k, len(keys))
    assert (pos >= 0).all() and (pos < m).all()
    # deterministic
    pos2 = _bit_positions(np.array(keys, dtype=np.int64), k, m)
    assert (pos == pos2).all()
