"""The ray-job-submit entrypoint: build + search via main() on a live session."""

import json
import tempfile

from frankensearch_ray.job import main
from frankensearch_ray.sources import pages


def test_job_build_then_search(ray_session, capsys):
    paths = pages.tier_t1()
    d = tempfile.mkdtemp()
    rc = main(
        [
            "build",
            "--source",
            *paths,
            "--index-dir",
            d,
            "--id-col",
            "url",
            "--html-col",
            "html",
            "--num-shards",
            "4",
            "--salt-threshold",
            "25",
            "--salt-buckets",
            "2",
            "--target-partition-rows",
            "50",
        ]
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip())
    assert built["docs"] == 141 and built["shards"] >= 4
    assert built["docs_per_sec"] > 0

    qf = tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False)
    qf.write("rust ownership\nweb crawl\n")
    qf.close()
    rc = main(["search", "--index-dir", d, "--queries", qf.name, "--limit", "5"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["n_queries"] == 2
    assert len(res["results"][0]["hits"]) > 0

    # resume: same args skip finished partitions and still publish
    rc = main(
        [
            "build",
            "--source",
            *paths,
            "--index-dir",
            d,
            "--id-col",
            "url",
            "--html-col",
            "html",
            "--num-shards",
            "4",
            "--salt-threshold",
            "25",
            "--salt-buckets",
            "2",
            "--target-partition-rows",
            "50",
        ]
    )
    assert rc == 0
    again = json.loads(capsys.readouterr().out.strip())
    assert again["docs"] == built["docs"]


def test_job_build_from_jsonl(ray_session, capsys, tmp_path):
    """--format jsonl: the job stages row-format shards to parquet and the
    resulting index answers queries identically to a parquet-source build."""
    import pyarrow.parquet as pq

    from frankensearch_ray.search.searcher import LocalSearcher

    src = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "n_chars"],
    )
    jl = tmp_path / "docs.jsonl"
    with open(jl, "w") as f:
        for row in src.to_pylist():
            f.write(json.dumps(row, sort_keys=True) + "\n")
    d = str(tmp_path / "idx")
    rc = main(
        [
            "build",
            "--source",
            str(jl),
            "--format",
            "jsonl",
            "--index-dir",
            d,
            "--id-col",
            "doc_id",
            "--content-col",
            "text",
            "--num-shards",
            "4",
            "--salt-threshold",
            "200",
            "--salt-buckets",
            "4",
            "--target-partition-rows",
            "2000",
        ]
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip())
    assert built["docs"] == src.num_rows
    s = LocalSearcher(d)
    hits = s.search("hash merge window", limit=5)["hits"]
    assert len(hits) == 5
