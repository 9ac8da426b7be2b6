"""explain_topk: the LexicalBm25 explanation component
(``core/src/explanation.rs``).

Integer scoring inputs (tf, df) are value-oracled by the driver-gate
mirror in ``test_entry_oracle.py``; here we pin the float half of the
contract: evaluating each query term alone and f32-summing the per-term
scores in clause order must reproduce every hit's score bit-for-bit —
i.e. the explanation's components really do decompose the final score.
"""

from __future__ import annotations

import numpy as np

from frankensearch_ray.contract.parser import parse_default
from frankensearch_ray.pipelines import docsearch

SF = "/root/testdata/sf0.001"
QUERY = "hash merge window"


class TestExplain:
    def test_per_term_contributions_sum_bit_exact(self, ray_session):
        s = docsearch.searcher_for(SF)
        res = s.search(QUERY, limit=10)
        parsed = parse_default(QUERY, analyze=s._query_analyze)
        per_term = [
            (cl.query.text, *s.evaluate(cl.query))
            for cl in parsed.query.children
        ]
        assert res["hits"]
        for h in res["hits"]:
            acc = np.float32(0.0)
            for _t, docids, scores in per_term:
                i = int(np.searchsorted(docids, h["docid"]))
                if i < len(docids) and int(docids[i]) == h["docid"]:
                    acc = np.float32(acc + np.float32(scores[i]))
            assert int(acc.view(np.uint32)) == h["score_bits"]

    def test_rows_align_with_bm25_topk(self, ray_session):
        exp = docsearch.explain_topk(SF, QUERY, k=10)
        top = docsearch.bm25_topk(SF, QUERY, k=10)
        top_pairs = set(
            zip(top["doc_id"].to_pylist(), top["rank"].to_pylist())
        )
        exp_pairs = set(
            zip(exp["doc_id"].to_pylist(), exp["rank"].to_pylist())
        )
        # every explained row belongs to a real hit, and every hit matched
        # at least one query term (pure-SHOULD query)
        assert exp_pairs == top_pairs
        assert all(v > 0 for v in exp["tf"].to_pylist())
        assert all(v > 0 for v in exp["df"].to_pylist())

    def test_terms_sorted_within_hit(self, ray_session):
        exp = docsearch.explain_topk(SF, QUERY, k=10)
        rows = list(
            zip(exp["rank"].to_pylist(), exp["term"].to_pylist())
        )
        assert rows == sorted(rows)
