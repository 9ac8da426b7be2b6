"""Webtext-curation semantics the driver oracle can't see: real PII
redaction (the synthetic corpus contains none), the blank-line default
paragraph delimiter, cap/order invariants, and the bit-length LM
contract against a brute-force scorer."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def webtext_mod(ray_session):
    from frankensearch_ray.pipelines import webtext

    return webtext


def _write_docs(tmp_path, texts, sources=None):
    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(sources or ["s0"] * n),
            "n_chars": pa.array([len(x or "") for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_pii_redact_real_pii(webtext_mod, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            "mail me at jo.doe+x@exa-mple.co.uk or admin@host.org now",
            "ssn 123-45-6789 then call +1 (555) 123-4567 ok",
            "server at 10.0.255.3 and 192.168.1.1; port 80",
            "clean text with no pii at all",
        ],
    )
    out = webtext_mod.pii_redact(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_email"] == 2
    assert "<EMAIL>" in out.loc[0, "text_clean"]
    assert "@" not in out.loc[0, "text_clean"]
    # SSN must be taken by the SSN rule, not half-eaten by phone
    assert out.loc[1, "n_ssn"] == 1 and out.loc[1, "n_phone"] == 1
    assert out.loc[1, "text_clean"] == "ssn <SSN> then call <PHONE> ok"
    assert out.loc[2, "n_ipv4"] == 2
    assert out.loc[2, "text_clean"].startswith("server at <IP> and <IP>;")
    assert out.loc[3, "text_clean"] == "clean text with no pii at all"
    assert (
        out.loc[3, ["n_email", "n_ssn", "n_ipv4", "n_phone"]].astype(int) == 0
    ).all()


def test_pii_custom_patterns_run_after_builtins(webtext_mod, tmp_path):
    sf = _write_docs(tmp_path, ["agent smith met agent jones", "no agents"])
    out = (
        webtext_mod.pii_redact(
            sf, custom_patterns=(("agent", r"\bagent [a-z]+", "<AGENT>"),)
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "n_agent"] == 2
    assert out.loc[0, "text_clean"] == "<AGENT> met <AGENT>"
    assert out.loc[1, "n_agent"] == 0


def test_dedup_paragraphs_blank_line_default(webtext_mod, tmp_path):
    boiler = "subscribe to our newsletter"
    sf = _write_docs(
        tmp_path,
        [
            f"unique alpha\n\n{boiler}\n\nunique beta",
            f"{boiler}\n\nsomething else entirely",
            "a fully unique document\n\nwith two paragraphs",
            f"leading\n\n\n{boiler}",  # 3 newlines: still ONE delimiter
        ],
    )
    out = webtext_mod.dedup_paragraphs(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_paras"] == 3 and out.loc[0, "n_removed"] == 1
    assert out.loc[0, "text_clean"] == "unique alpha\n\nunique beta"
    assert out.loc[1, "text_clean"] == "something else entirely"
    assert out.loc[2, "n_removed"] == 0
    assert out.loc[2, "text_clean"] == "a fully unique document\n\nwith two paragraphs"
    assert out.loc[3, "n_paras"] == 2 and out.loc[3, "text_clean"] == "leading"
    assert boiler not in " ".join(out["text_clean"])


def test_dedup_paragraphs_within_doc_repeat_is_df1(webtext_mod, tmp_path):
    # a paragraph repeated INSIDE one doc has df=1 — it must survive
    sf = _write_docs(tmp_path, ["echo\n\necho\n\nmiddle", "other\n\nthing"])
    out = webtext_mod.dedup_paragraphs(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_removed"] == 0
    assert out.loc[0, "text_clean"] == "echo\n\necho\n\nmiddle"


def test_dedup_paragraphs_all_removed_empty_text(webtext_mod, tmp_path):
    sf = _write_docs(tmp_path, ["same", "same", "same"])
    out = webtext_mod.dedup_paragraphs(sf).to_pandas()
    assert (out["n_removed"] == 1).all()
    assert (out["text_clean"] == "").all()


def test_dedup_paragraphs_shard_invariance(webtext_mod):
    a = webtext_mod.dedup_paragraphs(
        SF, delim_regex=r"\s+the\s+", joiner=" the ", n_shards=3
    ).to_pandas()
    b = webtext_mod.dedup_paragraphs(
        SF, delim_regex=r"\s+the\s+", joiner=" the ", n_shards=17
    ).to_pandas()
    assert a.equals(b)


def test_dedup_paragraphs_bloom_semi_join_mode_equality(webtext_mod, tmp_path):
    # bloom pushdown must be output-identical to ship-all, including
    # docs with removals, untouched docs, and the joiner normalization
    boiler = "copyright footer"
    sf = _write_docs(
        tmp_path,
        [f"unique {i}\n\n{boiler}" if i % 3 == 0 else f"solo {i}\n\n\ntext {i}" for i in range(30)],
    )
    a = webtext_mod.dedup_paragraphs(sf, semi_join="none").to_pandas()
    b = webtext_mod.dedup_paragraphs(sf, semi_join="bloom").to_pandas()
    assert a.equals(b)
    assert (a["n_removed"] > 0).any() and (a["n_removed"] == 0).any()
    # \n\n\n collapses to the \n\n joiner on BOTH paths (untouched docs
    # emit the normalized re-join, not the raw text)
    assert b.set_index("doc_id").loc[1, "text_clean"] == "solo 1\n\ntext 1"


def test_dedup_paragraphs_bloom_mode_equality_on_sf(webtext_mod):
    kw = dict(delim_regex=r"\s+the\s+", joiner=" the ")
    a = webtext_mod.dedup_paragraphs(SF, semi_join="none", **kw).to_pandas()
    b = webtext_mod.dedup_paragraphs(SF, semi_join="bloom", **kw).to_pandas()
    assert a.equals(b)


def test_source_caps_keeps_doc_id_prefix(webtext_mod, tmp_path):
    sf = _write_docs(
        tmp_path,
        [f"doc {i}" for i in range(20)],
        sources=[f"h{i % 3}" for i in range(20)],
    )
    out = webtext_mod.source_caps(sf, cap=2).to_pandas()
    # per source, exactly the 2 LOWEST doc_ids survive
    for s, g in out.groupby("source"):
        lowest = sorted(i for i in range(20) if f"h{i % 3}" == s)[:2]
        assert sorted(g["doc_id"]) == lowest
    assert len(out) == 6


def test_source_caps_cap_larger_than_group(webtext_mod, tmp_path):
    sf = _write_docs(tmp_path, ["a", "b"], sources=["x", "y"])
    out = webtext_mod.source_caps(sf, cap=100).to_pandas()
    assert len(out) == 2


def test_quality_lm_matches_bruteforce(webtext_mod, tmp_path):
    texts = [
        "the the the the common words here",
        "zyxgarble qwplofmz unique unique rare",
        "the common the common",
    ]
    sf = _write_docs(tmp_path, texts)
    out = webtext_mod.quality_lm(sf).to_pandas().set_index("doc_id")

    toks = [t.lower().split() for t in texts]
    cf: dict[str, int] = {}
    for ts in toks:
        for w in ts:
            cf[w] = cf.get(w, 0) + 1
    total = sum(cf.values())
    for i, ts in enumerate(toks):
        bits = sum((total // cf[w]).bit_length() for w in ts)
        assert out.loc[i, "n_tokens"] == len(ts)
        assert out.loc[i, "nll_bits"] == bits
        assert out.loc[i, "bits_per_token_x100"] == (100 * bits) // len(ts)
    # rare-word soup scores strictly more bits/token than boilerplate
    assert (
        out.loc[1, "bits_per_token_x100"] > out.loc[0, "bits_per_token_x100"]
    )


def test_quality_lm_shard_invariance(webtext_mod):
    a = webtext_mod.quality_lm(SF, n_shards=3).to_pandas()
    b = webtext_mod.quality_lm(SF, n_shards=19).to_pandas()
    assert a.equals(b)


def test_webtext_sinks_match_table_path(webtext_mod, tmp_path):
    for fn, sort_cols in [
        (webtext_mod.pii_redact, ["doc_id"]),
        (webtext_mod.quality_lm, ["doc_id"]),
    ]:
        table = fn(SF).to_pandas()
        out = str(tmp_path / fn.__name__)
        assert fn(SF, output_path=out) is None
        sink = (
            pq.read_table(out)
            .to_pandas()[list(table.columns)]
            .sort_values(sort_cols)
            .reset_index(drop=True)
        )
        assert sink.equals(table)
