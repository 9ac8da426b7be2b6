"""Extension surface (SURVEY §2.11): Analyzer protocol + registry,
LexicalRead/LexicalWrite traits, and a custom analyzer end-to-end.

Mirrors the reference seams: ``TokenAnalyzer`` (``scribe.rs:142-176``),
``LexicalRead``/``LexicalWrite`` (``core/src/traits.rs:927-1062``).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frankensearch_ray import extension as ext
from frankensearch_ray.build import BuildConfig, build_index
from frankensearch_ray.contract.analyzer import (
    analyze_admitted_scalar,
    tokenize_column,
)
from frankensearch_ray.search.searcher import LocalSearcher
from frankensearch_ray.sources.extract import render_page


class UnderscoreAnalyzer(ext.ScalarAnalyzer):
    """Toy custom analyzer: ``_`` is a token character, so ``foo_bar``
    stays ONE term (the default analyzer splits it)."""

    name = "underscore"

    def analyze(self, text: str):
        out = []
        for pos, m in enumerate(re.finditer(r"[A-Za-z0-9_]+", text)):
            tok = m.group(0).lower()
            # ASCII corpus: char offsets == byte offsets
            out.append((tok, pos, m.start(), m.end()))
        return out


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


DOCS = [
    ("d1", "value foo_bar here"),
    ("d2", "plain beta gamma words"),
    ("d3", "another foo_bar and beta"),
]


def _build(tmp_path, analyzer: str, name: str):
    src = tmp_path / f"src_{name}.parquet"
    pq.write_table(_pages_table(DOCS), src)
    d = str(tmp_path / f"idx_{name}")
    cfg = BuildConfig(
        id_col="url",
        html_col="html",
        verify_text_col=None,
        num_shards=2,
        salt_threshold=10**9,
        target_partition_rows=2,
        analyzer=analyzer,
    )
    build_index([str(src)], d, cfg, resume=False)
    return d


class TestAnalyzerProtocol:
    def test_builtins_satisfy_protocol(self):
        for name in ("frankensearch_default", "cass", "cass_prefix"):
            assert isinstance(ext.get_analyzer(name), ext.Analyzer)

    def test_module_attr_spec_resolution(self):
        a = ext.get_analyzer("tests.test_extension:UnderscoreAnalyzer")
        assert isinstance(a, ext.Analyzer)
        assert a.name == "underscore"
        # now registered under its own name too
        assert ext.get_analyzer("underscore") is a

    def test_unknown_name_raises(self):
        with pytest.raises(KeyError, match="unknown analyzer"):
            ext.get_analyzer("nope_never_registered")

    def test_scalar_adapter_matches_vectorized_default(self):
        """The generic derived column path must agree with the vectorized
        Arrow path when both wrap the same scalar contract."""
        adapter = ext.ScalarAnalyzer(analyze_admitted_scalar, name="adapted")
        texts = pa.array(
            [
                "Hello, World! 42",
                None,
                "",
                "Caffè läuft über",
                "foo_bar x-y z.q",
            ]
        )
        at, ai, ap = adapter.analyze_column(texts)
        vt, vi, vp = tokenize_column(texts)
        # vectorized path may reorder docs (ascii/non-ascii split) — compare
        # per-doc token/position sequences
        def by_doc(toks, idx, pos):
            out = {}
            for t, i, p in zip(toks.to_pylist(), idx, pos):
                out.setdefault(int(i), []).append((t, int(p)))
            return out

        assert by_doc(at, ai, ap) == by_doc(vt, vi, vp)

    def test_default_analyzer_scalar_contract(self):
        a = ext.get_analyzer("frankensearch_default")
        assert a.analyze("Hello World") == analyze_admitted_scalar("Hello World")
        assert a.query_terms("Hello World") == ["hello", "world"]


class TestCustomAnalyzerEndToEnd:
    def test_build_and_search_with_custom_analyzer(self, ray_session, tmp_path):
        d = _build(
            tmp_path, "tests.test_extension:UnderscoreAnalyzer", "custom"
        )
        s = LocalSearcher(d)
        # dictionary holds the compound term, not the default split
        assert [h["id"] for h in s.search("foo_bar", 10)["hits"]] == ["d1", "d3"] or {
            h["id"] for h in s.search("foo_bar", 10)["hits"]
        } == {"d1", "d3"}
        assert s.search("foo", 10)["hits"] == []

    def test_default_analyzer_splits_same_corpus(self, ray_session, tmp_path):
        d = _build(tmp_path, "frankensearch_default", "default")
        s = LocalSearcher(d)
        assert {h["id"] for h in s.search("foo", 10)["hits"]} == {"d1", "d3"}

    def test_analyzer_switch_invalidates_resume_checkpoints(
        self, ray_session, tmp_path
    ):
        """Rebuilding the same index dir with a different analyzer must
        re-tokenize every partition (fingerprint binding), not silently
        reuse checkpoints routed under the old token contract."""
        src = tmp_path / "src_switch.parquet"
        pq.write_table(_pages_table(DOCS), src)
        d = str(tmp_path / "idx_switch")
        base = dict(
            id_col="url",
            html_col="html",
            verify_text_col=None,
            num_shards=2,
            salt_threshold=10**9,
            target_partition_rows=2,
        )
        build_index([str(src)], d, BuildConfig(**base), resume=False)
        assert LocalSearcher(d).search("foo", 10)["hits"] != []
        build_index(
            [str(src)],
            d,
            BuildConfig(**base, analyzer="tests.test_extension:UnderscoreAnalyzer"),
            resume=True,
        )
        s = LocalSearcher(d)
        assert s.search("foo", 10)["hits"] == []
        assert {h["id"] for h in s.search("foo_bar", 10)["hits"]} == {"d1", "d3"}

    def test_incremental_append_uses_manifest_analyzer(
        self, ray_session, tmp_path
    ):
        d = _build(
            tmp_path, "tests.test_extension:UnderscoreAnalyzer", "append"
        )
        w = ext.IndexWriter(d)
        w.index_documents(_pages_table([("d9", "fresh foo_qux payload")]))
        w.commit()
        s = LocalSearcher(d)
        assert [h["id"] for h in s.search("foo_qux", 10)["hits"]] == ["d9"]
        assert s.search("qux", 10)["hits"] == []


class TestReadWriteTraits:
    def test_searcher_satisfies_lexical_read(self, ray_session, tmp_path):
        d = _build(tmp_path, "frankensearch_default", "traits")
        s = LocalSearcher(d)
        assert isinstance(s, ext.LexicalRead)
        assert s.doc_count() == len(DOCS)

    def test_index_writer_satisfies_lexical_write(self, ray_session, tmp_path):
        d = _build(tmp_path, "frankensearch_default", "writer")
        w = ext.IndexWriter(d)
        assert isinstance(w, ext.LexicalWrite)
        w.index_documents(_pages_table([("d7", "omega fresh beta")]))
        w.delete_documents(["d2"])
        w.upsert_documents(_pages_table([("d1", "value rewritten here")]))
        m = w.commit()
        assert isinstance(m, dict)
        s = LocalSearcher(d)
        assert s.doc_count() == 3  # 3 base - 1 delete + 1 add (+upsert reuse)
        assert {h["id"] for h in s.search("beta", 10)["hits"]} == {"d3", "d7"}
        assert {h["id"] for h in s.search("rewritten", 10)["hits"]} == {"d1"}
