"""Canonical HTML -> (title, text) extraction.

The reference indexes filesystem documents, not web pages; BASELINE's
``input_hint`` adds the web-page shape with the per-row invariant
``extract_text(html) == text`` byte-identically per url.  This module IS the
extraction spec (versioned, deterministic):

Canonical page grammar (produced by ``pages.synthesize``):

    <html><head><title>{esc(title)}</title></head><body>
      {"<p>" + esc(para) + "</p>" for para in text.split("\\n\\n")}
    </body></html>

with the fixed HTML escape ``& -> &amp;``, ``< -> &lt;``, ``> -> &gt;``
(applied in that order; unescape applies the inverse in reverse order).

``extract_batch`` is the vectorized Arrow hot path (fixed-pattern splits and
replacements, all ``pyarrow.compute`` C++ kernels); ``extract_scalar`` is
the readable reference implementation.  They are parity-tested.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

EXTRACTOR_VERSION = "fsray-extract-v1"

_PREFIX = "<html><head><title>"
_MID = "</title></head><body>"
_SUFFIX = "</body></html>"


def escape_html(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def unescape_html(s: str) -> str:
    return s.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")


def render_page(title: str, text: str) -> str:
    """The canonical page serialization (the generator side of the spec)."""
    paras = text.split("\n\n")
    body = "".join(f"<p>{escape_html(p)}</p>" for p in paras)
    return f"{_PREFIX}{escape_html(title)}{_MID}{body}{_SUFFIX}"


_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_P_RE = re.compile(r"<p>(.*?)</p>", re.S)


def extract_scalar(html: str) -> tuple[str, str]:
    """Reference extractor: returns ``(title, text)``."""
    m = _TITLE_RE.search(html)
    title = unescape_html(m.group(1)) if m else ""
    paras = [unescape_html(p) for p in _P_RE.findall(html)]
    return title, "\n\n".join(paras)


def _unescape_arr(arr: pa.Array) -> pa.Array:
    arr = pc.replace_substring(arr, pattern="&gt;", replacement=">")
    arr = pc.replace_substring(arr, pattern="&lt;", replacement="<")
    return pc.replace_substring(arr, pattern="&amp;", replacement="&")


def extract_batch(html: pa.Array) -> tuple[pa.Array, pa.Array]:
    """Vectorized extractor over a string/binary column.

    Returns ``(title: string array, text: string array)``.  Canonical pages
    decode exactly; non-canonical HTML degrades to regex extraction via the
    scalar path (detected per row).
    """
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        html = html.cast(pa.large_string() if pa.types.is_large_binary(html.type) else pa.string())
    html = pc.fill_null(html, "")

    # canonicality needs all THREE markers: prefix, suffix, AND exactly
    # one head/body mid marker — prefix+suffix alone admits rows whose
    # missing mid marker would crash pc.list_element(inner, 1) below,
    # and rows with an embedded extra marker would silently diverge
    # from the scalar reference
    canonical = pc.and_(
        pc.and_(
            pc.starts_with(html, pattern=_PREFIX),
            pc.ends_with(html, pattern=_SUFFIX),
        ),
        pc.equal(pc.count_substring(html, pattern=_MID), 1),
    )
    if not pc.all(canonical).as_py():
        # mixed batch: run the vectorized kernel on the canonical subset
        # and the regex scalar reference on the remainder, reassembled in
        # row order — one malformed row must not demote the whole
        # partition to the per-row loop
        mask = canonical.to_numpy(zero_copy_only=False)
        import numpy as np

        if mask.any():
            good_idx = np.flatnonzero(mask)
            g_title, g_text = extract_batch(html.take(pa.array(good_idx)))
            titles: list = [None] * len(html)
            texts: list = [None] * len(html)
            for j, i in enumerate(good_idx):
                titles[int(i)] = g_title[j].as_py()
                texts[int(i)] = g_text[j].as_py()
            for i in np.flatnonzero(~mask):
                t, x = extract_scalar(html[int(i)].as_py())
                titles[int(i)] = t
                texts[int(i)] = x
            return (
                pa.array(titles, type=pa.string()),
                pa.array(texts, type=pa.string()),
            )
        titles2, texts2 = [], []
        for v in html.to_pylist():
            t, x = extract_scalar(v)
            titles2.append(t)
            texts2.append(x)
        return (
            pa.array(titles2, type=pa.string()),
            pa.array(texts2, type=pa.string()),
        )

    # strip the fixed prefix, split head from body at the fixed mid marker
    inner = pc.split_pattern(
        pc.utf8_slice_codeunits(html, start=len(_PREFIX), stop=2**31 - 1),
        pattern=_MID,
        max_splits=1,
    )
    title = _unescape_arr(pc.list_element(inner, 0))
    # body = "<p>p1</p><p>p2</p>...</body></html>"
    body = pc.list_element(inner, 1)
    body = pc.replace_substring(
        body, pattern=_SUFFIX, replacement="", max_replacements=1
    )
    body = pc.replace_substring(
        body, pattern="<p>", replacement="", max_replacements=1
    )
    paras = pc.split_pattern(body, pattern="</p><p>")
    if isinstance(paras, pa.ChunkedArray):
        paras = paras.combine_chunks()
    # only the LAST paragraph of each row carries the trailing "</p>"
    # (escaped content cannot contain a literal "</p>"), so a single
    # max_replacements=1 pass over the flat values is exact
    flat = pc.replace_substring(
        paras.flatten(), pattern="</p>", replacement="", max_replacements=1
    )
    fixed_lists = pa.ListArray.from_arrays(paras.offsets, _unescape_arr(flat))
    text = pc.binary_join(fixed_lists, "\n\n")
    return title.cast(pa.string()), text.cast(pa.string())
