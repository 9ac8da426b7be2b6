"""Shared test fixtures.

Ray is initialised ONCE per pytest session (only when a test actually
requests the ``ray_session`` fixture) and shut down at teardown.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_FIXTURES = Path("/root/reference/tests/fixtures")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def language_contract():
    with open(REFERENCE_FIXTURES / "quill_language_contract.json") as f:
        return json.load(f)


@pytest.fixture(scope="session")
def reference_corpus():
    with open(REFERENCE_FIXTURES / "corpus.json") as f:
        return json.load(f)["documents"]


@pytest.fixture(scope="session")
def reference_queries():
    with open(REFERENCE_FIXTURES / "queries.json") as f:
        return json.load(f)


@pytest.fixture(scope="session")
def edge_cases():
    with open(REFERENCE_FIXTURES / "edge_cases.json") as f:
        return json.load(f)["cases"]


@pytest.fixture(scope="session")
def tmp_index_root(tmp_path_factory):
    return tmp_path_factory.mktemp("indexes")
