"""Snippet kernel tests pinned to the reference contract.

Reference: ``quill/src/snippet.rs`` semantics + the
``behavior-snippet-output`` fixture case (unicode golden) of
``tests/fixtures/quill_language_contract.json``.
"""

from __future__ import annotations

from frankensearch_ray.search.snippet import SnippetGenerator, escape_html


def gen(terms: dict[str, int], max_chars: int = 200) -> SnippetGenerator:
    return SnippetGenerator(terms, max_chars=max_chars)


class TestUnicodeGolden:
    def test_fixture_unicode_golden(self):
        # two Unicode scalars consume four UTF-8 bytes; adding the next
        # token would end at byte 10 (> max_chars 6)
        g = gen({"éé": 1}, max_chars=6)
        assert g.snippet("éé alpha") == "<b>éé</b>"


class TestFragmentSelection:
    def test_no_match_returns_none(self):
        assert gen({"xyz": 3}).snippet("alpha beta gamma") is None

    def test_empty_source_returns_none(self):
        assert gen({"a": 1}).snippet("") is None
        assert gen({"a": 1}).snippet("   ") is None

    def test_df_zero_terms_ignored(self):
        assert gen({"alpha": 0}).snippet("alpha beta") is None

    def test_single_match_highlights(self):
        assert gen({"beta": 1}).snippet("alpha beta gamma") == (
            "alpha <b>beta</b> gamma"
        )

    def test_rare_term_fragment_wins(self):
        # weight 1/(1+df): rare=0.5, common=1/101 -> window holding the
        # rare term must win
        text = "common filler words here . " * 10 + "rare treasure"
        g = gen({"rare": 1, "common": 100}, max_chars=20)
        out = g.snippet(text)
        assert "<b>rare</b>" in out

    def test_two_occurrences_beat_one(self):
        text = "zz once filler . " + "x " * 120 + "zz and zz together"
        out = gen({"zz": 1}, max_chars=30).snippet(text)
        assert out.count("<b>zz</b>") == 2

    def test_tie_prefers_earliest(self):
        text = "match early window . " + "y " * 120 + "match late window"
        out = gen({"match": 1}, max_chars=25).snippet(text)
        assert "early" in out and "late" not in out

    def test_fragment_never_splits_token(self):
        # a single token longer than max_chars still renders whole
        token = "a" * 50
        out = gen({token: 1}, max_chars=10).snippet("xx " + token + " yy")
        assert out == f"<b>{token}</b>"

    def test_case_insensitive_match(self):
        # analyzer lowercases source tokens; terms are post-analysis
        assert gen({"beta": 1}).snippet("alpha BETA gamma") == (
            "alpha <b>BETA</b> gamma"
        )


class TestEscaping:
    def test_source_escaped_tags_trusted(self):
        # fragment spans token boundaries: the trailing quote after the
        # last token 'c' is outside the fragment window
        out = gen({"b": 1}).snippet('<a href="x">b</a> & \'c\'')
        assert out == (
            "&lt;a href=&quot;x&quot;&gt;<b>b</b>&lt;/a&gt; &amp; &#x27;c"
        )

    def test_escape_html_map(self):
        assert escape_html("\"&'<>") == "&quot;&amp;&#x27;&lt;&gt;"


class TestPrefixFallback:
    def test_prefix_when_no_match_short_source(self):
        g = gen({"zz": 1}, max_chars=200)
        assert g.snippet_or_prefix("plain text") == "plain text"

    def test_prefix_bounded_at_token_end(self):
        g = gen({"zz": 1}, max_chars=10)
        # last token ending within 10 bytes: "alpha beta" -> "alpha beta"[:10]
        assert g.snippet_or_prefix("alpha beta gamma") == "alpha beta"

    def test_prefix_char_boundary_when_no_token_fits(self):
        g = gen({"zz": 1}, max_chars=3)
        # "ééé" is 6 bytes, no token ends within 3 -> char-boundary prefix
        out = g.snippet_or_prefix("ééé more")
        assert out == "é"  # 2 bytes; boundary backoff from byte 3

    def test_strict_mode_none(self):
        assert gen({"zz": 1}).snippet("plain text") is None


class TestWeights:
    def test_duplicate_term_keeps_max_weight(self):
        g = SnippetGenerator({"a": 5})
        g2 = SnippetGenerator({"a": 5, "A": 2})  # distinct keys unaffected
        assert g.weights["a"] == g2.weights["a"]


class TestSearcherIntegration:
    def test_search_with_snippets(self, ray_session, tmp_index_root):
        import pytest

        from frankensearch_ray.build import BuildConfig, build_index
        from frankensearch_ray.search.searcher import LocalSearcher
        from frankensearch_ray.sources import pages

        paths = pages.tier_t1()
        d = str(tmp_index_root / "t1_snip")
        cfg = BuildConfig(
            id_col="url",
            html_col="html",
            verify_text_col="text",
            num_shards=2,
            salt_threshold=10**9,
            target_partition_rows=50,
        )
        build_index(paths, d, cfg, resume=False)
        s = LocalSearcher(d)
        res = s.search("rust ownership", limit=5, snippets=True)
        assert len(res["hits"]) == 5
        joined = " ".join(h["snippet"] or "" for h in res["hits"])
        assert "<b>" in joined
        for h in res["hits"]:
            if h["snippet"]:
                assert len(h["snippet"].encode()) < 600  # bounded fragments


def test_snippets_contract_entry_detects_violations(ray_session, monkeypatch):
    """VERDICT r04 #7: the contract booleans are computed for real —
    all 1 on the honest engine, 0 when a snippet violates the contract
    (so the driver's value-hash would catch a regression)."""
    from frankensearch_ray.pipelines import docsearch as dsx

    sf = "/root/testdata/sf0.001"
    good = dsx.search_snippets_contract(sf)
    assert good.num_rows > 0
    for col in ("has_highlight", "is_substring", "marks_are_terms"):
        assert set(good[col].to_pylist()) == {1}, col

    s = dsx.searcher_for(sf)
    orig = s.search

    def doctored(query, **kw):
        res = orig(query, **kw)
        if kw.get("snippets"):
            for h in res["hits"]:
                h["snippet"] = "<b>zzz</b> text not present in any doc"
        return res

    monkeypatch.setattr(s, "search", doctored)
    bad = dsx.search_snippets_contract(sf)
    assert set(bad["is_substring"].to_pylist()) == {0}
    assert set(bad["marks_are_terms"].to_pylist()) == {0}
