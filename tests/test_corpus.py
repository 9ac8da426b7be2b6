"""Corpus-curation operator invariants (exactness itself is pinned by the
driver-mimicking oracle gate in test_entry_oracle.py; these cover the
properties the SQL comparison can't see — partitioning invariance and
sample monotonicity)."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_mod(ray_session):
    from frankensearch_ray.pipelines import corpus

    return corpus


def test_pack_spans_tile_sequences(corpus_mod):
    t = corpus_mod.pack_sequences(SF, seq_len=128).to_pandas()
    assert ((t["tok_begin"] >= 0) & (t["tok_end"] <= 128)).all()
    assert (t["tok_begin"] < t["tok_end"]).all()
    # within each sequence, spans are disjoint and contiguous from 0;
    # every sequence except the last is fully tiled to 128
    last_seq = t["seq_id"].max()
    for seq, g in t.groupby("seq_id"):
        g = g.sort_values("tok_begin")
        assert g["tok_begin"].iloc[0] == 0
        assert (g["tok_begin"].to_numpy()[1:] == g["tok_end"].to_numpy()[:-1]).all()
        if seq != last_seq:
            assert g["tok_end"].iloc[-1] == 128


def test_pack_range_partitioning_invariance(corpus_mod):
    """The distributed prefix sum must not depend on how doc_id space is
    cut into ranges."""
    a = corpus_mod.pack_sequences(SF, rows_per_range=1_000_000).to_pandas()
    b = corpus_mod.pack_sequences(SF, rows_per_range=37).to_pandas()
    assert a.equals(b)


def test_pack_sink_matches_table_path(corpus_mod, tmp_path):
    import pyarrow.parquet as pq

    table = corpus_mod.pack_sequences(SF).to_pandas()
    out = str(tmp_path / "packed")
    assert corpus_mod.pack_sequences(SF, output_path=out) is None
    sink = (
        pq.read_table(out)
        .to_pandas()[["seq_id", "doc_id", "tok_begin", "tok_end"]]
        .sort_values(["seq_id", "doc_id"])
        .reset_index(drop=True)
    )
    assert sink.equals(table)


def test_ngram_topk_shard_invariance(corpus_mod):
    a = corpus_mod.ngram_topk(SF, k=50, n_shards=4).to_pandas()
    b = corpus_mod.ngram_topk(SF, k=50, n_shards=61).to_pandas()
    assert a.equals(b)


def test_doc_keywords_shard_invariance(corpus_mod):
    """The tf⨝df join must not depend on how terms or docs are sharded."""
    a = corpus_mod.doc_keywords(SF, n_shards=4).to_pandas()
    b = corpus_mod.doc_keywords(SF, n_shards=61).to_pandas()
    assert a.equals(b)


def test_decontaminate_excludes_eval_docs(corpus_mod):
    t = corpus_mod.decontaminate(SF).to_pandas()
    assert (t["doc_id"] % 97 != 0).all()
    assert (t["n_hit_ngrams"] >= 1).all()
    # a 1-gram overlap check is a superset of the 3-gram one (every
    # contaminated doc shares at least the grams' constituent tokens)
    t1 = corpus_mod.decontaminate(SF, n=1).to_pandas()
    assert set(t["doc_id"]) <= set(t1["doc_id"])


def test_curate_filter_matches_composed_operators(corpus_mod):
    """The fused pass must equal the composition of the three individual
    operators it fuses (quality_scores ⨝ repetition_stats ⨝ lang_id)."""
    from frankensearch_ray.pipelines.textstats import lang_id, quality_scores

    fused = corpus_mod.curate_filter(SF).to_pandas()
    q = quality_scores(SF).to_pandas().set_index("doc_id")
    r = corpus_mod.repetition_stats(SF).to_pandas().set_index("doc_id")
    lg = lang_id(SF).to_pandas().set_index("doc_id")
    keep = (
        (q["n_tokens"] >= 20)
        & (q["n_tokens"] <= 100_000)
        & (q["max_word_len"] <= 20)
        & (q["digit_tokens"] * 100 <= q["n_tokens"] * 10)
        & (r["top_token_count"] * 100 <= q["n_tokens"] * 20)
        & (lg["lang_pred"] == "en")
    )
    want = sorted(q.index[keep])
    assert fused["doc_id"].tolist() == want
    assert (fused.set_index("doc_id")["n_tokens"] == q["n_tokens"][keep]).all()


def test_curate_filter_sink_matches_table_path(corpus_mod, tmp_path):
    import pyarrow.parquet as pq

    table = corpus_mod.curate_filter(SF).to_pandas()
    out = str(tmp_path / "curated")
    assert corpus_mod.curate_filter(SF, output_path=out) is None
    sink = (
        pq.read_table(out)
        .to_pandas()[["doc_id", "n_tokens", "top_token_count"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sink.equals(table)


def test_tokenize_ids_positions_and_unk(corpus_mod):
    from frankensearch_ray.pipelines.textstats import quality_scores

    t = corpus_mod.tokenize_ids(SF).to_pandas()
    q = quality_scores(SF).to_pandas().set_index("doc_id")
    # per-doc positions are 0..n-1 contiguous and counts match the
    # quality pass's n_tokens
    for doc, g in t.groupby("doc_id"):
        assert g["pos"].tolist() == list(range(len(g)))
        assert len(g) == q.loc[doc, "n_tokens"]
    assert (t["token_id"] >= 0).all() and (t["token_id"] <= 30).all()
    # a tighter vocab maps strictly more positions to UNK
    t5 = corpus_mod.tokenize_ids(SF, vocab_size=5).to_pandas()
    assert (t5["token_id"] == 5).sum() >= (t["token_id"] == 30).sum()


def test_dup_spans_sink_matches_table_path(corpus_mod, tmp_path):
    import pyarrow.parquet as pq

    table = corpus_mod.dup_spans(SF).to_pandas()
    out = tmp_path / "dups"
    assert corpus_mod.dup_spans(SF, output_path=str(out)) is None
    sink = (
        pq.read_table(str(out))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sink.equals(table)


def test_dup_spans_shard_invariance_and_bounds(corpus_mod):
    """Dup verdicts must not depend on the exchange fan-out K, and the
    dup count can never exceed the window count."""
    a = corpus_mod.dup_spans(SF).to_pandas()
    b = corpus_mod.dup_spans(SF, n_shards=3).to_pandas()
    assert a.equals(b)
    assert (a["n_dup_windows"] <= a["n_windows"]).all()
    assert (a["n_dup_windows"] >= 0).all()
    # a longer window is strictly harder to duplicate
    c = corpus_mod.dup_spans(SF, n=8).to_pandas()
    m = a.merge(c, on="doc_id", suffixes=("_5", "_8"))
    assert (m["n_dup_windows_8"] <= m["n_dup_windows_5"]).all()


def test_collocations_counts_consistent(corpus_mod):
    """Pair counts bound unigram counts, and the top list agrees with
    ngram_topk at n=2 (same exchange, same tie contract)."""
    t = corpus_mod.collocations(SF, k=20).to_pandas()
    assert (t["pair_cnt"] <= t["w1_cnt"]).all()
    assert (t["pair_cnt"] <= t["w2_cnt"]).all()
    top = corpus_mod.ngram_topk(SF, n=2, k=20).to_pandas()
    assert (t["w1"] + " " + t["w2"]).tolist() == top["ngram"].tolist()
    assert t["pair_cnt"].tolist() == top["cnt"].tolist()


def test_source_quantiles_orders(ray_session):
    from frankensearch_ray.pipelines.textstats import (
        quality_scores,
        source_quantiles,
    )

    t = source_quantiles(SF).to_pandas()
    assert (t["p50_tokens"] <= t["p90_tokens"]).all()
    assert (t["p90_tokens"] <= t["max_tokens"]).all()
    # histogram CDF walk agrees with a direct per-source computation
    q = quality_scores(SF).to_pandas()
    import duckdb
    import pyarrow.parquet as pq

    src = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "source"])
    j = q.merge(src.to_pandas(), on="doc_id")
    ref = duckdb.sql(
        """SELECT source, count(*) AS n_docs,
                  quantile_disc(n_tokens, 0.5) AS p50_tokens,
                  quantile_disc(n_tokens, 0.9) AS p90_tokens,
                  max(n_tokens) AS max_tokens
           FROM j GROUP BY source ORDER BY source"""
    ).df()
    assert t["n_docs"].tolist() == ref["n_docs"].tolist()
    assert t["p50_tokens"].tolist() == ref["p50_tokens"].tolist()
    assert t["p90_tokens"].tolist() == ref["p90_tokens"].tolist()


def test_sample_stratified_monotone(corpus_mod):
    """A smaller-n sample is a prefix (per stratum) of a larger-n one —
    the hash ranking is a total order, so samples nest."""
    small = corpus_mod.sample_stratified(SF, n_per_stratum=5).to_pandas()
    big = corpus_mod.sample_stratified(SF, n_per_stratum=25).to_pandas()
    small_set = set(map(tuple, small.to_numpy()))
    big_set = set(map(tuple, big.to_numpy()))
    assert small_set <= big_set
    assert (small.groupby("lang").size() <= 5).all()
    assert (big.groupby("lang").size() <= 25).all()


def test_kmv_sketch_within_10pct_of_exact(ray_session):
    from frankensearch_ray.pipelines.textstats import (
        distinct_terms_sketch,
        token_stats,
    )

    exact = token_stats(SF)["distinct_terms"][0].as_py()
    est = distinct_terms_sketch(SF)["distinct_terms_est"][0].as_py()
    assert abs(est - exact) / exact <= 0.10, (est, exact)
    # deterministic: same sketch twice is bit-identical
    assert est == distinct_terms_sketch(SF)["distinct_terms_est"][0].as_py()


def test_kmv_estimator_branch_large_vocab(ray_session, tmp_path):
    """The testdata vocab (~31 terms) only hits the exact small-set
    branch; this synthesizes 20k distinct terms so the (k-1)/h_(k)
    estimator itself is exercised (KMV stderr ~ 1/sqrt(k-1) ~ 3%)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from frankensearch_ray.pipelines.textstats import distinct_terms_sketch

    docs = [
        " ".join(f"w{d * 10 + j}" for j in range(10)) for d in range(2000)
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(2000)), "text": docs}),
        str(tmp_path / "documents.parquet"),
    )
    est = distinct_terms_sketch(str(tmp_path))["distinct_terms_est"][0].as_py()
    assert abs(est - 20000) / 20000 <= 0.10, est


def test_repetition_stats_brute_force(corpus_mod):
    """Differential against a Python Counter on the first docs."""
    import re
    from collections import Counter

    import duckdb

    t = corpus_mod.repetition_stats(SF).to_pandas().set_index("doc_id")
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id LIMIT 40"
    ).fetchall()
    for doc_id, text in rows:
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        bigs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        r = t.loc[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["top_token_count"] == (max(Counter(toks).values()) if toks else 0)
        assert r["n_bigrams"] == len(bigs)
        assert r["top_bigram_count"] == (max(Counter(bigs).values()) if bigs else 0)


def test_remove_dup_spans_consistent_with_dup_spans(corpus_mod):
    """The rewrite must agree with the signal op: docs with zero dup
    windows keep every token verbatim; docs with dup windows drop
    between n and n_dup_windows + n - 1 tokens (overlap collapses);
    kept_text always re-joins exactly n_tokens - n_dropped tokens."""
    sig = corpus_mod.dup_spans(SF).to_pandas().set_index("doc_id")
    rw = corpus_mod.remove_dup_spans(SF).to_pandas().set_index("doc_id")
    assert set(sig.index) == set(rw.index)
    import duckdb

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    import re

    for doc_id, r in rw.iterrows():
        s = sig.loc[doc_id]
        assert r["n_tokens"] == s["n_windows"] + 4 or s["n_windows"] == 0
        toks = [
            w for w in re.split(r"[^a-z0-9]+", texts[doc_id].lower()) if w
        ]
        assert r["n_tokens"] == len(toks)
        kept = r["kept_text"].split(" ") if r["kept_text"] else []
        assert len(kept) == r["n_tokens"] - r["n_dropped"]
        if s["n_dup_windows"] == 0:
            assert r["n_dropped"] == 0
            assert kept == toks
        else:
            # w dup windows cover at most 5w tokens (disjoint) and at
            # least w + 4 (one contiguous run)
            assert (
                min(r["n_tokens"], s["n_dup_windows"] + 4)
                <= r["n_dropped"]
                <= min(r["n_tokens"], 5 * s["n_dup_windows"])
            )
            # surviving tokens are an order-preserving subsequence
            it = iter(toks)
            assert all(w in it for w in kept)


def test_remove_dup_spans_shard_invariance(corpus_mod):
    a = corpus_mod.remove_dup_spans(SF).to_pandas()
    b = corpus_mod.remove_dup_spans(SF, n_shards=3).to_pandas()
    assert a.equals(b)


def test_rare_token_scores_local_reference(corpus_mod):
    """Exact agreement with a brute-force local computation at sf0.001
    (the oracle gate pins sf0.01) plus shard invariance."""
    import collections
    import re

    import pyarrow.parquet as pq

    got = corpus_mod.rare_token_scores(SF).to_pandas().set_index("doc_id")
    t = pq.read_table(SF + "/documents.parquet")
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    cf: collections.Counter = collections.Counter()
    doc_toks = {}
    for d, s in texts.items():
        toks = [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]
        doc_toks[d] = toks
        cf.update(toks)
    total = sum(cf.values())
    for d, toks in doc_toks.items():
        if not toks:
            assert d not in got.index
            continue
        n_rare = sum(1 for w in toks if 128 * cf[w] < total)
        r = got.loc[d]
        assert r["n_tokens"] == len(toks)
        assert r["n_rare"] == n_rare
        assert r["rare_pct"] == (100 * n_rare) // len(toks)
    b = corpus_mod.rare_token_scores(SF, n_shards=3).to_pandas()
    assert b.set_index("doc_id").equals(got)


def test_rare_token_scores_sink_differential(corpus_mod, tmp_path):
    import pandas as pd
    import ray.data as rd

    table = corpus_mod.rare_token_scores(SF).to_pandas()
    out = str(tmp_path / "rare")
    assert corpus_mod.rare_token_scores(SF, output_path=out) is None
    sunk = (
        rd.read_parquet(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sunk, table, check_dtype=False)


def test_shuffle_shards_is_balanced_permutation(corpus_mod):
    """Positions form an exact 0..N-1 permutation, shards tile at
    shard_size, and the assignment is range-count-invariant."""
    t = corpus_mod.shuffle_shards(SF, shard_size=64).to_pandas()
    n = len(t)
    pos = (t["shard_id"].to_numpy() * 64 + t["pos_in_shard"].to_numpy())
    assert sorted(pos) == list(range(n))
    full = t["shard_id"].value_counts()
    assert (full[full.index != t["shard_id"].max()] == 64).all()
    b = corpus_mod.shuffle_shards(SF, shard_size=64, n_ranges=3).to_pandas()
    assert b.equals(t)
    # hash order: consecutive positions are not consecutive doc_ids
    by_pos = t.set_index(pos).sort_index()["doc_id"].to_numpy()
    assert (np.abs(np.diff(by_pos)) == 1).mean() < 0.1


def test_shuffle_shards_sink_differential(corpus_mod, tmp_path):
    import pandas as pd
    import ray.data as rd

    table = corpus_mod.shuffle_shards(SF).to_pandas()
    out = str(tmp_path / "shuf")
    assert corpus_mod.shuffle_shards(SF, output_path=out) is None
    sunk = (
        rd.read_parquet(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sunk, table, check_dtype=False)


def test_mix_sources_monotone_and_exact(corpus_mod):
    """Raising a source's share only ADDS docs (retune without
    invalidating shards); 0 drops all, 100 keeps all; membership is the
    pinned hash rule."""
    import pyarrow.parquet as pq

    full = corpus_mod.mix_sources(SF).to_pandas()
    t = pq.read_table(SF + "/documents.parquet")
    assert len(full) == t.num_rows  # default 100% keeps everything
    half = corpus_mod.mix_sources(SF, default_pct=50).to_pandas()
    quarter = corpus_mod.mix_sources(SF, default_pct=25).to_pandas()
    assert set(quarter["doc_id"]) <= set(half["doc_id"]) <= set(
        full["doc_id"]
    )
    ids = np.array(sorted(t["doc_id"].to_pylist()), np.int64)
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    want = ids[(h.astype(np.int64) % 100) < 50]
    assert half["doc_id"].tolist() == want.tolist()
    none = corpus_mod.mix_sources(SF, default_pct=0).to_pandas()
    assert len(none) == 0
    # per-source override beats the default
    one = corpus_mod.mix_sources(
        SF, pct_by_source={"src0": 100}, default_pct=0
    ).to_pandas()
    assert set(one["source"]) == {"src0"}


def test_decontaminate_apply_partitions_train_set(ray_session):
    """survivors ∪ contaminated = all train docs; survivors ∩ report = ∅."""
    import pyarrow.parquet as pq

    from frankensearch_ray.pipelines import corpus as co

    sf = "/root/testdata/sf0.001"
    report = co.decontaminate(sf)
    survivors = set(co.decontaminate_apply(sf)["doc_id"].to_pylist())
    contaminated = set(report["doc_id"].to_pylist())
    all_ids = pq.read_table(sf + "/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    train = {d for d in all_ids if d % 97 != 0}
    assert survivors | contaminated == train
    assert survivors & contaminated == set()


def test_facet_stats_matches_bruteforce(ray_session):
    import re

    import pyarrow.parquet as pq

    from frankensearch_ray.pipelines import corpus as co

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text", "source", "n_chars"])
    agg: dict[str, list] = {}
    for r in t.to_pylist():
        toks = [w for w in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()) if w]
        if "merge" in toks:
            a = agg.setdefault(r["source"], [0, 0, None, None])
            a[0] += 1
            a[1] += r["n_chars"]
            a[2] = r["n_chars"] if a[2] is None else min(a[2], r["n_chars"])
            a[3] = r["n_chars"] if a[3] is None else max(a[3], r["n_chars"])
    out = co.facet_stats(sf)
    got = {
        r["source"]: [r["n_docs"], r["sum_chars"], r["min_chars"], r["max_chars"]]
        for r in out.to_pylist()
    }
    assert got == agg


def test_curate_pipeline_composition_law(ray_session, tmp_path):
    """curate_pipeline ≡ curate_filter ∩ decontaminate_apply, then
    min-id per identical text over the survivors — the chained flagship
    must equal the composition of its published stages; and the sink
    path must equal the table path."""
    import pyarrow.parquet as pq

    from frankensearch_ray.pipelines import corpus

    sf = "/root/testdata/sf0.001"
    chained = corpus.curate_pipeline(sf).to_pandas()

    passed = corpus.curate_filter(sf).to_pandas().set_index("doc_id")
    decon = set(
        corpus.decontaminate_apply(sf).to_pandas()["doc_id"].tolist()
    )
    surv = sorted(set(passed.index) & decon)
    # min-id per identical text over the survivor set
    texts = (
        pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    import pandas as pd

    sdf = pd.DataFrame(
        {
            "doc_id": surv,
            "text": texts.loc[surv].values,
            "n_tokens": passed.loc[surv, "n_tokens"].values,
        }
    )
    want = (
        sdf.groupby("text", as_index=False)
        .agg(doc_id=("doc_id", "min"), n_tokens=("n_tokens", "min"))
        .sort_values("doc_id")[["doc_id", "n_tokens"]]
        .reset_index(drop=True)
    )
    got = chained.sort_values("doc_id").reset_index(drop=True)
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert (got["n_tokens"].values == want["n_tokens"].values).all()
    # the sink path streams the same rows
    out = str(tmp_path / "curated")
    assert corpus.curate_pipeline(sf, output_path=out) is None
    sink = (
        pq.read_table(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert (sink["doc_id"].values == got["doc_id"].values).all()
