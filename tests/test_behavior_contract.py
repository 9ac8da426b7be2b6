"""Fixture-driven conformance walk over ``behavior_cases`` and
``harvested_queries`` from ``quill_language_contract.json``.

Each test anchors to one behavior case *by id* and asserts the named
contracts against this engine's surface (several of the umbrella cases —
scoring, analyzers — are pinned in depth by their dedicated suites; here
we assert the fixture's contract list is the one those suites cover).
Rust-specific contracts (Send + Sync, Cx cancellation tokens, no private
runtime) have no Python/Ray analogue and are skipped explicitly.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pytest

from frankensearch_ray.build import BuildConfig, build_index, load_manifest
from frankensearch_ray.contract.analyzer import (
    MAX_TERM_BYTES,
    analyze_admitted_scalar,
    analyze_cass_scalar,
    generate_edge_ngrams,
)
from frankensearch_ray.contract.parser import classify_query, parse_default
from frankensearch_ray.contract.query_ast import (
    MUST,
    MUST_NOT,
    SHOULD,
    Boolean,
    Clause,
    QueryField,
    Term,
)
from frankensearch_ray.schema import FIELD_BOOSTS
from frankensearch_ray.search.searcher import LocalSearcher
from frankensearch_ray.sources.extract import render_page
from frankensearch_ray.state import maintenance as mnt


@pytest.fixture(scope="module")
def behavior(language_contract):
    return {c["id"]: c for c in language_contract["behavior_cases"]}


def _pages_table(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "html": pa.array(
                [render_page(f"title {r[0]}", r[1]).encode() for r in rows],
                pa.binary(),
            ),
        }
    )


BEHAVIOR_DOCS = [
    ("b1", "alpha beta gamma"),
    ("b2", "alpha delta"),
    ("b3", "beta epsilon unique3"),
    ("b4", "gamma zeta alpha"),
    ("b5", "delta eta"),
    ("b6", "alpha beta theta"),
]


@pytest.fixture(scope="module")
def bidx(ray_session, tmp_index_root):
    import pyarrow.parquet as pq

    src = str(tmp_index_root / "behavior_src.parquet")
    pq.write_table(_pages_table(BEHAVIOR_DOCS), src)
    d = str(tmp_index_root / "behavior_idx")
    cfg = BuildConfig(
        id_col="url",
        html_col="html",
        verify_text_col=None,
        num_shards=2,
        salt_threshold=10**9,
        target_partition_rows=3,
    )
    build_index([src], d, cfg, resume=False)
    return d


def _cterm(text):
    return Term(text, [QueryField("content", 1.0)])


class TestSchemaDefaultFields:
    def test_modeled_fields_match_fixture(self, behavior):
        case = behavior["behavior-schema-default-fields"]
        by_name = {f["name"]: f for f in case["fields"]}
        # we model content + title as analyzed text fields with positions
        for name in ("content", "title"):
            f = by_name[name]
            assert f["tokenizer"] == "frankensearch_default"
            assert f["record_option"] == "WithFreqsAndPositions"
            assert f["indexed"] and f["stored"]
        # id is the raw keyword external id (our idmap column)
        assert by_name["id"]["tokenizer"] == "raw"
        # query-side boosts: content 1.0, title 2.0 (schema.py)
        assert FIELD_BOOSTS == {"content": 1.0, "title": 2.0}


class TestCollectors:
    def test_contracts(self, behavior, bidx):
        assert set(behavior["behavior-collectors"]["contracts"]) == {
            "top-k plus offset",
            "exact count",
            "unscored id set",
            "count-free top-k rank parity",
        }
        s = LocalSearcher(bidx)
        full = s.search("alpha beta", limit=6)["hits"]
        assert len(full) >= 3
        # top-k plus offset: page 2 is an exact slice of the full ranking
        page = s.search("alpha beta", limit=2, offset=1)["hits"]
        assert [h["docid"] for h in page] == [h["docid"] for h in full[1:3]]
        # exact count: total independent of limit
        counted = s.search("alpha", limit=1, count=True)
        docids, _ = s.evaluate(_cterm("alpha"))
        assert counted["total"] == len(docids)
        # unscored id set: evaluate() yields the full match set
        assert set(int(d) for d in docids) == {
            h["docid"] for h in s.search("alpha", limit=10)["hits"]
        }
        # count-free top-k rank parity: same hits with and without count
        again = s.search("alpha beta", limit=6, count=True)["hits"]
        assert [(h["docid"], h["score"]) for h in again] == [
            (h["docid"], h["score"]) for h in full
        ]


class TestWriterMutations:
    def test_contracts(self, behavior, bidx, tmp_path):
        names = behavior["behavior-writer-mutations"]["contracts"]
        assert "delete_all" in names and "upsert delete then add" in names
        import shutil

        d = str(tmp_path / "wm_idx")
        shutil.copytree(bidx, d)
        n0 = LocalSearcher(d).doc_count()
        # add
        mnt.append_table(d, _pages_table([("w1", "iota kappa")]))
        assert LocalSearcher(d).doc_count() == n0 + 1
        # batch add
        mnt.append_table(
            d, _pages_table([("w2", "lam mu"), ("w3", "nu xi")])
        )
        assert LocalSearcher(d).doc_count() == n0 + 3
        # upsert = delete then add (revision visible, count flat)
        mnt.upsert_table(d, _pages_table([("w1", "iota changed")]))
        s = LocalSearcher(d)
        assert s.doc_count() == n0 + 3
        assert [h["id"] for h in s.search("changed", limit=5)["hits"]] == ["w1"]
        assert s.search("kappa", limit=5)["hits"] == []
        # delete
        mnt.delete_documents(d, ["w2"])
        assert LocalSearcher(d).doc_count() == n0 + 2
        # delete_all: every live doc tombstoned
        mnt.delete_all(d)
        s = LocalSearcher(d)
        assert s.doc_count() == 0
        assert s.search("alpha", limit=10)["hits"] == []

    def test_delete_all_then_append_recovers(self, bidx, tmp_path):
        import shutil

        d = str(tmp_path / "wm_idx2")
        shutil.copytree(bidx, d)
        mnt.delete_all(d, auto_maintain=False)
        mnt.append_table(d, _pages_table([("z1", "omega fresh")]))
        s = LocalSearcher(d)
        assert s.doc_count() == 1
        assert [h["id"] for h in s.search("omega", limit=5)["hits"]] == ["z1"]


class TestReaderSnapshot:
    def test_contracts(self, behavior, bidx, tmp_path):
        assert "immediate Quill visibility" in (
            behavior["behavior-reader-snapshot"]["contracts"]
        )
        import shutil

        d = str(tmp_path / "rs_idx")
        shutil.copytree(bidx, d)
        old = LocalSearcher(d)
        old_hits = old.search("unique3", limit=5)["hits"]
        mnt.append_table(d, _pages_table([("r1", "omicron only")]))
        # immediate visibility for a NEW reader; live doc_count
        new = LocalSearcher(d)
        assert new.doc_count() == old.doc_count() + 1
        assert [h["id"] for h in new.search("omicron", limit=5)["hits"]] == [
            "r1"
        ]
        # stable external doc-id materialization: same doc, same id/docid
        new_hits = new.search("unique3", limit=5)["hits"]
        assert [(h["id"], h["docid"]) for h in new_hits] == [
            (h["id"], h["docid"]) for h in old_hits
        ]


class TestSegmentsDurability:
    def test_checksummed_manifest_falls_back(self, behavior, bidx, tmp_path):
        assert "checksummed manifest" in (
            behavior["behavior-segments-durability"]["contracts"]
        )
        import os
        import shutil

        d = str(tmp_path / "dur_idx")
        shutil.copytree(bidx, d)
        good = load_manifest(d)
        assert good.get("_checksum")
        # bump generation so MANIFEST and MANIFEST.prev differ
        mnt._write_manifest(d, dict(good))
        # corrupt the CURRENT slot with valid-JSON-but-wrong-bytes content
        path = os.path.join(d, "manifest.json")
        with open(path) as f:
            m = json.load(f)
        m["partitions"] = []  # silent corruption, still parses
        with open(path, "w") as f:
            json.dump(m, f)
        recovered = load_manifest(d)
        assert recovered["partitions"] == good["partitions"]

    def test_tombstone_aware_open(self, bidx, tmp_path):
        import shutil

        d = str(tmp_path / "dur_idx2")
        shutil.copytree(bidx, d)
        mnt.delete_documents(d, ["b3"], auto_maintain=False)
        s = LocalSearcher(d)
        assert s.search("unique3", limit=5)["hits"] == []
        assert s.doc_count() == len(BEHAVIOR_DOCS) - 1


class TestErrorsNoPanic:
    def test_index_not_found(self, tmp_path):
        with pytest.raises((FileNotFoundError, OSError)):
            LocalSearcher(str(tmp_path / "does_not_exist"))

    def test_invalid_config(self, tmp_path):
        with pytest.raises((ValueError, TypeError)):
            cfg = BuildConfig(id_col="url", html_col="html", num_shards=0)
            build_index([], str(tmp_path / "x"), cfg, resume=False)

    @pytest.mark.parametrize(
        "q",
        [
            "",
            '"',
            "(((",
            "AND OR NOT",
            "-" * 500,
            "\x00\x01\x02",
            "日本語" * 100,
            '"unterminated phrase',
            "+ - + -",
        ],
    )
    def test_invalid_input_never_panics(self, bidx, q):
        s = LocalSearcher(bidx)
        out = s.search(q, limit=5)
        assert isinstance(out["hits"], list)


class TestPaginationAndLimitZero:
    def test_contracts(self, behavior, bidx):
        c = behavior["behavior-pagination-and-limit-zero"]["contracts"]
        assert "limit zero returns no hits without collector panic" in c
        s = LocalSearcher(bidx)
        out = s.search("alpha", limit=0)
        assert out["hits"] == []
        counted = s.search("alpha", limit=0, count=True)
        assert counted["hits"] == []
        docids, _ = s.evaluate(_cterm("alpha"))
        assert counted["total"] == len(docids)
        # offset pages use page-local rank starting at zero
        page = s.search("alpha beta", limit=2, offset=2)["hits"]
        assert [h["rank"] for h in page] == list(range(len(page)))


class TestBooleanOccur:
    def test_contracts(self, behavior, bidx):
        assert len(behavior["behavior-boolean-occur"]["contracts"]) == 5
        s = LocalSearcher(bidx)

        def ids(node):
            docids, _ = s.evaluate(node)
            return set(int(d) for d in docids)

        alpha, beta = ids(_cterm("alpha")), ids(_cterm("beta"))
        assert alpha and beta
        # Should-only requires one
        assert ids(
            Boolean([Clause(SHOULD, _cterm("alpha")), Clause(SHOULD, _cterm("beta"))])
        ) == (alpha | beta)
        # Should optional only with a positive Must
        assert ids(
            Boolean([Clause(MUST, _cterm("alpha")), Clause(SHOULD, _cterm("beta"))])
        ) == alpha
        # Should plus MustNot still requires one Should
        assert ids(
            Boolean(
                [Clause(SHOULD, _cterm("alpha")), Clause(MUST_NOT, _cterm("beta"))]
            )
        ) == (alpha - beta)
        # MustNot-only matches nothing
        assert ids(Boolean([Clause(MUST_NOT, _cterm("alpha"))])) == set()
        # MustNot contributes no score
        base = s.evaluate(Boolean([Clause(MUST, _cterm("alpha"))]))
        negd = s.evaluate(
            Boolean([Clause(MUST, _cterm("alpha")), Clause(MUST_NOT, _cterm("beta"))])
        )
        keep = np.isin(base[0], negd[0])
        assert np.array_equal(base[0][keep], negd[0])
        assert np.array_equal(base[1][keep], negd[1])


class TestUmbrellaCases:
    """Scoring/analyzer umbrella cases: their contract lists are pinned in
    depth by test_contract.py; assert the fixture's lists are what those
    suites cover so a fixture revision can't silently widen the surface."""

    def test_scoring_contract_list(self, behavior):
        assert set(behavior["behavior-scoring"]["contracts"]) == {
            "BM25 constants",
            "raw avgdl",
            "decoded per-document fieldnorm",
            "title boost",
            "f32 order",
            "stable tie key",
        }

    def test_analyzer_contract_list(self, behavior):
        assert set(behavior["behavior-analyzers"]["contracts"]) == {
            "exact token stream",
            "default",
            "hyphen",
            "CJK",
            "prefix",
            "oversized term admission",
        }

    def test_concurrency_case_is_rust_specific(self, behavior):
        # Send + Sync / Cx / private-runtime contracts are type-system
        # properties of the Rust engine; the Ray analogue (stateless
        # searchers + actor-pool replicas) is pinned by the pool≡driver
        # identity tests in test_build_search.py.
        assert behavior["behavior-concurrency"]["surface"] == "concurrency"


class TestOversizedTokenPositionGap:
    def test_position_gap(self, behavior):
        case = behavior["behavior-oversized-token-position-gap"]
        assert case["expected_retained_positions"] == [0, 2]
        big = "x" * (MAX_TERM_BYTES + 1)  # 65,531 bytes: dropped
        toks = analyze_admitted_scalar(f"kept {big} tail")
        assert [(t[0], t[1]) for t in toks] == [("kept", 0), ("tail", 2)]


class TestCassPrefixAndCjkBoundaries:
    def test_prefix_field_lengths(self, behavior):
        case = behavior["behavior-cass-prefix-and-cjk-boundaries"]
        assert any("2 through 20" in c for c in case["contracts"])
        grams = generate_edge_ngrams("abcdefghijklmnopqrstuvwxyz").split()
        lens = sorted({len(g) for g in grams})
        assert lens == list(range(2, 21))

    def test_cjk_bigrams_drop_non_cjk(self):
        toks = [t[0] for t in analyze_cass_scalar("漢字abc平仮名")]
        # mixed-script input drops non-CJK chars before bigramming:
        # bigrams never span the dropped latin run
        assert "字a" not in toks and all(
            not (any(ord(c) < 128 for c in t) and any(ord(c) > 128 for c in t))
            for t in toks
        )


class TestOversizedQueryLowering:
    """AST-level lowering of oversized terms (fixture shapes; not
    reachable from ordinary string queries because the 10k-scalar query
    truncation runs first — ``ordinary_string_query_reachable: false``)."""

    def test_shapes(self, behavior, bidx):
        case = behavior["behavior-quill-oversized-query-lowering"]
        assert case["token_bytes"] == MAX_TERM_BYTES + 1
        s = LocalSearcher(bidx)
        big = _cterm("x" * (MAX_TERM_BYTES + 1))
        valid = _cterm("alpha")
        vids, vscores = s.evaluate(valid)
        assert len(vids)
        # standalone oversized term -> Empty
        assert len(s.evaluate(big)[0]) == 0
        # Must(valid, oversized) -> Empty
        assert (
            len(
                s.evaluate(
                    Boolean([Clause(MUST, valid), Clause(MUST, big)])
                )[0]
            )
            == 0
        )
        # Should(valid, oversized) -> Should(valid)
        sids, _ = s.evaluate(
            Boolean([Clause(SHOULD, valid), Clause(SHOULD, big)])
        )
        assert set(int(d) for d in sids) == set(int(d) for d in vids)
        # Must(valid) + MustNot(oversized): the MustNot excludes nothing
        mids, mscores = s.evaluate(
            Boolean([Clause(MUST, valid), Clause(MUST_NOT, big)])
        )
        assert np.array_equal(mids, vids)


class TestSurfaceCoverage:
    def test_every_declared_fixture_id_is_in_an_asserted_group(
        self, language_contract
    ):
        """``surface_coverage`` indexes the contract's full surface by
        fixture id.  Our golden suites iterate the five case groups
        exhaustively (test_contract.py, test_parser.py,
        test_cass_parser.py, test_direct_boolean.py, this file), so
        group membership here means the id is executed somewhere."""
        groups = (
            language_contract["analyzer_cases"]
            + language_contract["helper_cases"]
            + language_contract["parse_tree_cases"]
            + language_contract["scoring_cases"]
            + language_contract["behavior_cases"]
        )
        known = {c["id"] for c in groups} | {
            c["id"] for c in language_contract["harvested_queries"]
        }
        declared = {
            fid
            for s in language_contract["surface_coverage"]
            for fid in s["fixture_ids"]
        }
        missing = declared - known
        assert not missing, f"surface_coverage ids with no case group: {missing}"


class TestHarvestedQueries:
    def test_each_parses_classifies_and_executes(
        self, language_contract, bidx
    ):
        s = LocalSearcher(bidx)
        expected_class = {
            "identifier": "Simple",
            "short_keyword": "Simple",
            "natural_language": "Simple",
            "phrase": "Phrase",
            "boolean": "Boolean",
            "glob": "Simple",
            "range": "Simple",
        }
        for case in language_contract["harvested_queries"]:
            q = case["query"]
            assert classify_query(q) == expected_class[case["query_class"]], (
                case["id"]
            )
            parsed = parse_default(q)
            out = s.run_parsed(parsed, limit=10, raw_query=q)
            assert isinstance(out["hits"], list), case["id"]

    def test_range_filters_execute_cass(self, language_contract):
        from frankensearch_ray.contract.cass import (
            CassQueryFilters,
            parse_cass,
        )

        case = next(
            c
            for c in language_contract["harvested_queries"]
            if c["id"] == "harvest-range"
        )
        f = CassQueryFilters(
            created_from=case["filters"]["created_from"],
            created_to=case["filters"]["created_to"],
        )
        parsed = parse_cass(case["query"], filters=f)
        assert parsed.query is not None
