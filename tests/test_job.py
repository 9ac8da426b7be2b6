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


def test_job_append_grows_live_index(ray_session, capsys, tmp_path):
    """`job append` streams new docs through the maintenance path; a
    crash-safe re-submit with --skip-live appends nothing; the grown
    index answers like the incremental entry's full-build law."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from frankensearch_ray import job
    from frankensearch_ray.build import BuildConfig, build_index
    from frankensearch_ray.pipelines.docsearch import bm25_topk
    from frankensearch_ray.search.searcher import LocalSearcher

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(sf + "/documents.parquet")
    mask = pc.not_equal(
        pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 3), 3)), 0
    )
    base_p = str(tmp_path / "base.parquet")
    rest_p = str(tmp_path / "rest.parquet")
    pq.write_table(t.filter(mask), base_p)
    pq.write_table(t.filter(pc.invert(mask)), rest_p)
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(
        id_col="doc_id",
        content_col="text",
        html_col=None,
        verify_text_col=None,
        num_shards=4,
        salt_threshold=200,
        salt_buckets=4,
        target_partition_rows=2_000,
    )
    build_index([base_p], idx, cfg, resume=False)

    rc = job.main(
        ["append", "--source", rest_p, "--index-dir", idx,
         "--id-col", "doc_id", "--batch-rows", "64"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs_appended"] == t.num_rows - pc.sum(mask).as_py()
    assert out["batches"] >= 2  # several delta generations

    # crash-safe re-submit: all ids live -> nothing appended
    rc = job.main(
        ["append", "--source", rest_p, "--index-dir", idx,
         "--id-col", "doc_id", "--skip-live"]
    )
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["docs_appended"] == 0
    assert out2["docs_skipped_live"] == out["docs_appended"]

    # grown index == full-build ranking (deterministic external re-rank)
    s = LocalSearcher(idx)
    hits = s.search("hash merge window", limit=26)["hits"]
    got = [
        int(h["id"])
        for h in sorted(hits, key=lambda h: (-h["score"], int(h["id"])))[:10]
    ]
    want = bm25_topk(sf)["doc_id"].to_pylist()
    assert got == want


def test_job_maintain_merges_generations(ray_session, capsys, tmp_path):
    """`job maintain` fires the width-tier merge once >= fanout
    consecutive same-tier delta generations exist, and search results
    are unchanged by the merge."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from frankensearch_ray import job
    from frankensearch_ray.build import BuildConfig, build_index
    from frankensearch_ray.search.searcher import LocalSearcher

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(sf + "/documents.parquet")
    mask = pc.less(t["doc_id"], 300)
    base_p = str(tmp_path / "base.parquet")
    rest_p = str(tmp_path / "rest.parquet")
    pq.write_table(t.filter(mask), base_p)
    pq.write_table(t.filter(pc.invert(mask)), rest_p)
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(
        id_col="doc_id",
        content_col="text",
        html_col=None,
        verify_text_col=None,
        num_shards=4,
        salt_threshold=200,
        salt_buckets=4,
        target_partition_rows=2_000,
    )
    build_index([base_p], idx, cfg, resume=False)
    # 200 docs in batches of 20 -> 10 small generations (auto_maintain
    # may roll some up inline; maintain must leave <= the tier bound)
    rc = job.main(
        ["append", "--source", rest_p, "--index-dir", idx,
         "--id-col", "doc_id", "--batch-rows", "20"]
    )
    assert rc == 0
    capsys.readouterr()
    s_before = LocalSearcher(idx)
    hits_before = [
        (h["id"], h["score_bits"])
        for h in s_before.search("hash merge window", limit=10)["hits"]
    ]
    rc = job.main(["maintain", "--index-dir", idx])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["generations_after"] <= out["generations_before"]
    s_after = LocalSearcher(idx)
    hits_after = [
        (h["id"], h["score_bits"])
        for h in s_after.search("hash merge window", limit=10)["hits"]
    ]
    assert hits_after == hits_before


def test_job_watch_applies_live_changes(ray_session, capsys, tmp_path):
    """`job watch` picks up files dropped into the source dir while the
    loop runs, applies them within the debounce window, and exits with
    the latency summary; all rows are searchable after."""
    import os
    import threading
    import time as _time

    import pyarrow.parquet as pq

    from frankensearch_ray import job
    from frankensearch_ray.build import BuildConfig, build_index
    from frankensearch_ray.search.searcher import LocalSearcher

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(sf + "/documents.parquet")
    d = str(tmp_path)
    pq.write_table(t.slice(0, 400), d + "/docs.parquet")
    idx = d + "/idx"
    cfg = BuildConfig(
        id_col="doc_id",
        content_col="text",
        html_col=None,
        verify_text_col=None,
        num_shards=4,
        salt_threshold=200,
        salt_buckets=4,
        target_partition_rows=2_000,
    )
    build_index([d + "/docs.parquet"], idx, cfg, resume=False)
    watch_dir = d + "/incoming"
    os.makedirs(watch_dir)

    def feeder():
        _time.sleep(0.4)
        pq.write_table(t.slice(400, 100), watch_dir + "/late.parquet")

    th = threading.Thread(target=feeder)
    th.start()
    rc = job.main(
        ["watch", "--index-dir", idx, "--source-dir", watch_dir,
         "--max-seconds", "2.5"]
    )
    th.join()
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["upserts"] == 100
    assert out["batches"] >= 1
    # every doc searchable afterwards: external-id probe of a late doc
    s = LocalSearcher(idx)
    assert len(s.search("hash merge window", limit=10)["hits"]) == 10


def test_job_delete_tombstones_and_is_idempotent(ray_session, capsys, tmp_path):
    """`job delete` removes the listed ids from results; a re-delete of
    the same ids adds zero tombstones (reference idempotence)."""
    from frankensearch_ray import job
    from frankensearch_ray.build import BuildConfig, build_index
    from frankensearch_ray.search.searcher import LocalSearcher

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(
        id_col="doc_id",
        content_col="text",
        html_col=None,
        verify_text_col=None,
        num_shards=4,
        salt_threshold=200,
        salt_buckets=4,
        target_partition_rows=2_000,
    )
    build_index([sf + "/documents.parquet"], idx, cfg, resume=False)
    s = LocalSearcher(idx)
    top = [h["id"] for h in s.search("hash merge window", limit=3)["hits"]]
    ids_file = str(tmp_path / "ids.txt")
    with open(ids_file, "w") as f:
        f.write("\n".join(top) + "\n")
    assert job.main(["delete", "--index-dir", idx, "--ids-file", ids_file]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs_deleted"] == 3
    after = [
        h["id"]
        for h in LocalSearcher(idx).search("hash merge window", limit=3)["hits"]
    ]
    assert not set(top) & set(after)
    assert job.main(["delete", "--index-dir", idx, "--ids-file", ids_file]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["docs_deleted"] == 0
