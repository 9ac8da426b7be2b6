"""Gates for the round-4 query-surface extensions: ordered sloppy phrase
(``phrase_near``), regex termdict expansion (``regex_search``), fuzzy BM25
(``fuzzy_search``) and the grouped top-k (``top_terms_per_source``) — each
checked against a brute-force Python oracle at sf0.001."""

from __future__ import annotations

import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from frankensearch_ray.pipelines import corpus, docsearch
from frankensearch_ray.pipelines.docsearch import searcher_for
from frankensearch_ray.schema import FIELD_CONTENT

SF = "/root/testdata/sf0.001"


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


@pytest.fixture(scope="module")
def doc_tokens(ray_session):
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    return {
        int(i): _tok(s or "")
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }


def _near_bruteforce(toks: list[str], words: list[str], slop: int) -> bool:
    """Exists strictly increasing positions p_i with toks[p_i] == words[i]
    and span <= slop + len(words) - 1 — literal backtracking oracle."""
    occ = [[i for i, t in enumerate(toks) if t == w] for w in words]
    if any(not o for o in occ):
        return False

    def chain(wi: int, prev: int, start: int) -> bool:
        if wi == len(words):
            return prev - start <= slop + len(words) - 1
        for p in occ[wi]:
            if p > prev and chain(wi + 1, p, start):
                return True
        return False

    return any(chain(1, p0, p0) for p0 in occ[0])


@pytest.mark.parametrize(
    "words,slop",
    [
        (["hash", "table"], 0),
        (["hash", "table"], 1),
        (["hash", "table"], 3),
        (["hash", "merge", "window"], 2),
        (["the", "the"], 1),
    ],
)
def test_phrase_near_matches_bruteforce(ray_session, doc_tokens, words, slop):
    s = searcher_for(SF)
    docids = s.phrase_near(FIELD_CONTENT, words, slop)
    got = sorted(int(x) for x in s.ids_for(docids))
    want = sorted(
        d for d, toks in doc_tokens.items() if _near_bruteforce(toks, words, slop)
    )
    assert got == want


def test_phrase_near_slop0_equals_phrase_match(ray_session):
    near = docsearch.phrase_near(SF, "hash", "table", slop=0)
    exact = docsearch.phrase_match(SF, "hash", "table")
    assert near["doc_id"].to_pylist() == exact["doc_id"].to_pylist()


def test_phrase_near_rejects_negative_slop(ray_session):
    s = searcher_for(SF)
    with pytest.raises(ValueError):
        s.phrase_near(FIELD_CONTENT, ["hash", "table"], -1)


def test_parser_slop_still_raises_unsupported(ray_session):
    """The extension must NOT relax the reference parity: the parser
    path keeps raising the typed UnsupportedQuery for slop != 0."""
    from frankensearch_ray.search.searcher import UnsupportedQuery

    s = searcher_for(SF)
    with pytest.raises(UnsupportedQuery):
        s.search('"hash table"~2', limit=5)


@pytest.mark.parametrize(
    "pattern",
    ["ha.h(ing|es)?", "merg(e|ing|ed)", ".*dow", "wi.*ow", "z{1,2}[aeiou]+.*"],
)
def test_regex_terms_matches_vocab_walk(ray_session, doc_tokens, pattern):
    """Prefix-bounded scan finds exactly the vocab terms the full regex
    walk finds — including leading-wildcard patterns (empty prefix)."""
    s = searcher_for(SF)
    got = s.regex_terms(
        FIELD_CONTENT, pattern, docsearch._regex_literal_prefix(pattern)
    )
    vocab = set()
    for toks in doc_tokens.values():
        vocab.update(toks)
    prog = re.compile(pattern)
    want = sorted(t for t in vocab if prog.fullmatch(t))
    assert got == want


def test_regex_literal_prefix_is_necessary():
    cases = {
        "ha.h": "ha",
        "hash": "hash",
        "ab*cd": "a",  # 'b' may be erased by '*'
        "a+bc": "",  # conservative: quantified literal stops the scan
        ".*dow": "",
        "x{2}y": "",
        "merg(e|ing)": "merg",
    }
    for pat, want in cases.items():
        got = docsearch._regex_literal_prefix(pat)
        assert got == want, (pat, got, want)
        # necessity: every full match of the pattern starts with the prefix
        prog = re.compile(pat)
        for probe in ("hash", "merge", "merging", "abcd", "acd", "window",
                      "xxy", "aabc", "shadow"):
            if prog.fullmatch(probe):
                assert probe.startswith(got), (pat, probe, got)


def test_fuzzy_expansion_is_exactly_lev_le_1(ray_session, doc_tokens):
    """The generate-and-probe expansion equals the true-Levenshtein vocab
    filter (completeness: no matched vocab term is missed)."""
    from tests.test_property import _levenshtein

    s = searcher_for(SF)
    vocab = set()
    for toks in doc_tokens.values():
        vocab.update(toks)
    for q in ("mergge", "windoq", "hash", "tabel"):
        got = {
            c
            for c in docsearch._edit1_neighborhood(q)
            if sum(int(r["df"]) for _b, r in s.term_rows(FIELD_CONTENT, c)) > 0
        }
        want = {t for t in vocab if _levenshtein(t, q) <= 1}
        assert got == want, q


def test_top_terms_per_source_matches_pandas(ray_session, doc_tokens):
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "source"])
    src_of = dict(zip(t["doc_id"].to_pylist(), t["source"].to_pylist()))
    counts: dict[tuple[str, str], int] = {}
    for d, toks in doc_tokens.items():
        for tok in toks:
            k = (src_of[d], tok)
            counts[k] = counts.get(k, 0) + 1
    want = []
    by_src: dict[str, list[tuple[int, str]]] = {}
    for (src, term), c in counts.items():
        by_src.setdefault(src, []).append((-c, term))
    for src in sorted(by_src):
        for rank, (nc, term) in enumerate(sorted(by_src[src])[:7]):
            want.append((src, term, -nc, rank))
    got_tbl = corpus.top_terms_per_source(SF, k=7)
    got = list(
        zip(
            got_tbl["source"].to_pylist(),
            got_tbl["term"].to_pylist(),
            got_tbl["cnt"].to_pylist(),
            got_tbl["rank"].to_pylist(),
        )
    )
    assert got == want


def test_top_terms_shard_precut_is_lossless(ray_session):
    """k larger than any per-shard vocabulary slice and a tiny shard
    count must agree — the per-shard pre-cut never drops a global
    winner (union-of-shard-top-k superset property)."""
    a = corpus.top_terms_per_source(SF, k=3, n_shards=2)
    b = corpus.top_terms_per_source(SF, k=3, n_shards=64)
    assert a.to_pydict() == b.to_pydict()


def test_sort_search_matches_source_values(ray_session, doc_tokens):
    """The sidecar gather must agree with the source parquet's n_chars for
    every matched doc, the order must be (value desc, doc_id asc), and the
    match set must equal the token-containment brute force."""
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "n_chars"])
    nchars = dict(zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()))
    term = "merge"
    want_ids = sorted(d for d, toks in doc_tokens.items() if term in toks)
    out = docsearch.sort_search(SF, term=term, k=10_000)
    got = list(
        zip(out["doc_id"].to_pylist(), out["sort_value"].to_pylist())
    )
    assert sorted(d for d, _v in got) == want_ids
    assert all(v == nchars[d] for d, v in got)
    assert got == sorted(got, key=lambda dv: (-dv[1], dv[0]))
    # k cut is a strict prefix of the full ordering
    head = docsearch.sort_search(SF, term=term, k=3)
    assert list(zip(head["doc_id"].to_pylist(), head["sort_value"].to_pylist())) == got[:3]


def test_numeric_histogram_partitions_match_set(ray_session, doc_tokens):
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "n_chars"])
    nchars = dict(zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()))
    term = "merge"
    vals = [nchars[d] for d, toks in doc_tokens.items() if term in toks]
    out = docsearch.numeric_histogram(SF, term=term, width=250)
    got = dict(zip(out["bucket_lo"].to_pylist(), out["n_docs"].to_pylist()))
    want: dict[int, int] = {}
    for v in vals:
        b = (v // 250) * 250
        want[b] = want.get(b, 0) + 1
    assert got == want
    assert sum(got.values()) == len(vals)


def test_min_should_match_matches_bruteforce(ray_session, doc_tokens):
    terms = ("hash", "merge", "window", "sort")
    for m in (1, 2, 3, 4):
        out = docsearch.min_should_match(SF, terms=terms, m=m)
        got = dict(zip(out["doc_id"].to_pylist(), out["n_matched"].to_pylist()))
        want = {}
        for d, toks in doc_tokens.items():
            s = set(toks)
            n = sum(t in s for t in terms)
            if n >= m:
                want[d] = n
        assert got == want, m
    # m=len(terms) == boolean AND of all; m=1 == boolean OR
    assert sorted(docsearch.min_should_match(SF, terms=("hash", "merge"), m=2)["doc_id"].to_pylist()) == sorted(
        docsearch.boolean_and(SF, "hash", "merge")["doc_id"].to_pylist()
    )
    with pytest.raises(ValueError):
        docsearch.min_should_match(SF, terms=("a", "b"), m=3)
    with pytest.raises(ValueError):
        docsearch.min_should_match(SF, terms=("a", "a"), m=1)


def test_phrase_prefix_matches_bruteforce(ray_session, doc_tokens):
    for w1, pre in (("hash", "mer"), ("merge", "t"), ("window", "zzz")):
        out = docsearch.phrase_prefix(SF, w1=w1, prefix=pre)
        got = out["doc_id"].to_pylist()
        want = sorted(
            d
            for d, toks in doc_tokens.items()
            if any(
                a == w1 and b.startswith(pre)
                for a, b in zip(toks, toks[1:])
            )
        )
        assert got == want, (w1, pre)
    # an exact-term prefix includes the plain phrase's matches
    pm = set(docsearch.phrase_match(SF, "hash", "table")["doc_id"].to_pylist())
    pp = set(docsearch.phrase_prefix(SF, w1="hash", prefix="table")["doc_id"].to_pylist())
    assert pm <= pp


def test_phrase_prefix_warns_on_expansion_cap(ray_session, monkeypatch):
    """ADVICE r04 #4: hitting the glob expansion cap is surfaced, not a
    silent subset."""
    import warnings

    from frankensearch_ray.pipelines import docsearch as dsx
    from frankensearch_ray.search.searcher import LocalSearcher

    sf = "/root/testdata/sf0.001"
    # force the cap below the fixture vocabulary's expansion count
    monkeypatch.setattr(LocalSearcher, "GLOB_EXPANSION_LIMIT", 1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dsx.phrase_prefix(sf, w1="hash", prefix="m")
    assert any("GLOB_EXPANSION_LIMIT" in str(x.message) for x in w)
