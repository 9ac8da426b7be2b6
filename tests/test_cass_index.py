"""CASS 15-field schema index: end-to-end execution gates.

The 39 CASS parse goldens previously only parsed; here every golden AST
EXECUTES against a built ``schema_kind="cass"`` index, and the facet /
created-range / prefix / STOREDMETA semantics are pinned against
independent Python recomputation on the source table.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from frankensearch_ray.contract.cass import CassQueryFilters, parse_cass

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cass(ray_session):
    from frankensearch_ray.cassindex import CassSearcher
    from frankensearch_ray.pipelines.cassearch import cass_index, derive_cass_source

    index_dir = cass_index(SF)
    src = pq.read_table(derive_cass_source(SF))
    return CassSearcher(index_dir), src


def _match_ids(searcher, query, filters=None):
    parsed = parse_cass(query, filters)
    docids, _ = searcher.s.evaluate(parsed.query)
    live = searcher.s.live_mask(docids)
    return sorted(int(x) for x in searcher.s.ids_for(docids[live]))


def test_all_39_goldens_execute(language_contract, cass):
    searcher, _src = cass
    cases = [
        c
        for c in language_contract["parse_tree_cases"]
        if c.get("parser") == "cass"
    ]
    assert len(cases) == 39
    for case in cases:
        parsed = parse_cass(case["input"])
        docids, scores = searcher.s.evaluate(parsed.query)
        assert docids.dtype == np.uint64, case["id"]
        assert len(docids) == len(scores), case["id"]


def test_term_matches_prefix_semantics(cass):
    """A CASS term matches content/title exactly AND any word with that
    prefix via the edge-ngram fields (Exact lowers over all 4 fields)."""
    searcher, src = cass
    got = _match_ids(searcher, "merge")
    want = sorted(
        int(i)
        for i, text in zip(src["id"].to_pylist(), src["content"].to_pylist())
        if any(tok.startswith("merge") for tok in text.split(" "))
    )
    assert got == want


def test_prefix_wildcard(cass):
    searcher, src = cass
    got = _match_ids(searcher, "mer*")
    want = sorted(
        int(i)
        for i, text in zip(src["id"].to_pylist(), src["content"].to_pylist())
        if any(tok.startswith("mer") for tok in text.split(" "))
    )
    assert got == want and len(got) > 0


def test_keyword_facet_and_created_range(cass):
    searcher, src = cass
    filters = CassQueryFilters(
        agents=["src1"], created_from=1_700_000_000 + 50 * 60
    )
    got = _match_ids(searcher, "the", filters)
    rows = zip(
        src["id"].to_pylist(),
        src["content"].to_pylist(),
        src["agent"].to_pylist(),
        src["created_at"].to_pylist(),
    )
    want = sorted(
        int(i)
        for i, text, agent, created in rows
        if any(t.startswith("the") for t in text.split(" "))
        and agent == "src1"
        and created >= 1_700_000_000 + 50 * 60
    )
    assert got == want and len(got) > 0


def test_source_filter_local(cass):
    searcher, src = cass
    got = _match_ids(
        searcher, "data", CassQueryFilters(source_filter="local")
    )
    assert got, "local filter should keep some matches"
    assert all(int(i) % 3 == 0 for i in got)  # origin_kind derivation


def test_boolean_and_not(cass):
    searcher, src = cass
    got = _match_ids(searcher, "merge && -join")
    rows = zip(src["id"].to_pylist(), src["content"].to_pylist())
    want = sorted(
        int(i)
        for i, text in rows
        if any(t.startswith("merge") for t in text.split(" "))
        and not any(t.startswith("join") for t in text.split(" "))
    )
    assert got == want


def test_storedmeta_roundtrip(cass):
    """STOREDMETA: stored-only columns round-trip per docid
    (``segment.rs:44-67`` metadata_json)."""
    searcher, src = cass
    hits = searcher.search("merge", limit=5)["hits"]
    assert hits
    by_id = {
        i: (w, p, sp, c)
        for i, w, p, sp, c in zip(
            src["id"].to_pylist(),
            src["workspace_original"].to_pylist(),
            src["preview"].to_pylist(),
            src["source_path"].to_pylist(),
            src["conversation_id"].to_pylist(),
        )
    }
    for h in hits:
        meta = searcher.metadata_for(h["docid"])
        w, p, sp, c = by_id[h["id"]]
        assert meta["workspace_original"] == w
        assert meta["preview"] == p
        assert meta["source_path"] == sp
        assert meta["conversation_id"] == c


def test_fast_path_equals_analyzer():
    """The split() fast path for plain word/space text must emit exactly
    the analyzer state machine's (term, position) stream."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from frankensearch_ray.cassindex import _scalar_text_postings
    from frankensearch_ray.contract.analyzer import analyze_cass_scalar

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet="abcXY01 -é一", max_size=40
            ),  # mixes fast-path and fallback rows
            max_size=6,
        )
    )
    def drive(rows):
        texts = pa.array(rows, pa.string())
        import numpy as np

        docids = np.arange(len(rows), dtype=np.uint64)
        fast, fcnt, _ = _scalar_text_postings(
            texts, 0, docids, analyze_cass_scalar
        )
        # oracle: force the scalar path by bypassing the regex
        slow_terms, slow_docs, slow_pos = [], [], []
        scnt = []
        for r, t in enumerate(rows):
            toks = analyze_cass_scalar(t or "")
            scnt.append(toks[-1][1] + 1 if toks else 0)
            for tok, pos, _a, _b in toks:
                slow_terms.append(tok)
                slow_docs.append(r)
                slow_pos.append(pos)
        got = sorted(
            zip(
                fast["docid"].to_pylist(),
                fast["term"].to_pylist(),
                fast["tf"].to_pylist(),
            )
        )
        import collections

        tf = collections.Counter(zip(slow_docs, slow_terms))
        want = sorted((d, t, c) for (d, t), c in tf.items())
        assert got == want
        assert list(fcnt) == scnt

    drive()


def test_msg_idx_numeric_range(cass):
    """msg_idx indexed as a numeric fast field (u64 path)."""
    from frankensearch_ray.contract.query_ast import RangeI64

    searcher, src = cass
    node = RangeI64(
        "msg_idx",
        {"value": 10, "bound": "Included"},
        {"value": 20, "bound": "Excluded"},
    )
    docids, _ = searcher.s.evaluate(node)
    got = sorted(int(x) for x in searcher.s.ids_for(docids))
    want = sorted(
        int(i)
        for i, m in zip(src["id"].to_pylist(), src["msg_idx"].to_pylist())
        if 10 <= m < 20
    )
    assert got == want and len(got) > 0


class TestPrefixVectorizedParity:
    """_prefix_text_postings (vectorized edge-ngram expansion) must be
    byte-identical to generate_edge_ngrams -> CassPrefixNormalize."""

    def test_parity_mixed_corpus(self):
        import random

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from frankensearch_ray.cassindex import (
            _prefix_text_postings,
            _scalar_text_postings,
        )
        from frankensearch_ray.contract.analyzer import (
            analyze_cass_scalar,
            generate_edge_ngrams,
        )

        rng = random.Random(5)
        texts = [
            "Hello World Programming",
            "a bc def ghij klmnopqrstuvwxyzabcdefgh",
            "  spaced   out  ",
            "",
            None,
            "naïve café unicode",
            "hyphen-ated words",
            "日本語テキスト",
            "dup dup dup prefix prefixes",
        ]
        for _ in range(120):
            words = [
                "".join(
                    rng.choice("abcdefgHIJJKL0123")
                    for _ in range(rng.randint(1, 25))
                )
                for _ in range(rng.randint(0, 12))
            ]
            s = " ".join(words)
            if rng.random() < 0.15:
                s += " é"
            texts.append(s)
        arr = pa.array(texts, pa.string())
        docids = np.arange(len(texts), dtype=np.uint64)
        new, cnt_new, tot_new = _prefix_text_postings(arr, 9, docids)
        old, cnt_old, tot_old = _scalar_text_postings(
            arr,
            9,
            docids,
            lambda t: analyze_cass_scalar(t, hyphen_decompose=False),
            pre=generate_edge_ngrams,
        )
        assert tot_new == tot_old
        assert (cnt_new == cnt_old).all()

        def canon(t):
            return t.take(
                pc.sort_indices(
                    t,
                    sort_keys=[("docid", "ascending"), ("term", "ascending")],
                )
            )

        assert canon(new).equals(canon(old))


class TestFacetCounts:
    """facet_counts invariants; exact value parity is covered by the
    driver-gate mirror in test_entry_oracle.py."""

    def test_counts_sum_to_match_set_per_facet(self, ray_session):
        from frankensearch_ray.contract.cass import CassQueryFilters, parse_cass
        from frankensearch_ray.pipelines import cassearch

        t = cassearch.facet_counts(SF, query="merge")
        s = cassearch._searcher(SF).s
        parsed = parse_cass("merge", CassQueryFilters())
        docids, _ = s.evaluate(parsed.query)
        n_matches = int(s.live_mask(docids).sum())
        import collections

        sums = collections.Counter()
        for f, n in zip(t["facet"].to_pylist(), t["n"].to_pylist()):
            assert n > 0
            sums[f] += n
        # every matched doc carries exactly one value per keyword facet
        assert sums == {
            "agent": n_matches,
            "workspace": n_matches,
            "origin_kind": n_matches,
        }

    def test_sorted_and_deterministic(self, ray_session):
        from frankensearch_ray.pipelines import cassearch

        a = cassearch.facet_counts(SF)
        b = cassearch.facet_counts(SF)
        assert a.equals(b)
        keys = list(zip(a["facet"].to_pylist(), a["value"].to_pylist()))
        assert keys == sorted(keys)
