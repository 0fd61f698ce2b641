"""The visualizer golden fixtures, asserted from the python side.

VERDICT r2 next #5: visualizer/test/fixtures/{dataset,goldens}.json pin the
worker protocol semantics. HERE the native C++ compute core (ctypes) and
the documented query-language semantics must reproduce the goldens; the
node suite (visualizer/test/fixtures.test.mjs) asserts the SAME files
through the JS worker pipeline — identical goldens on both sides pin the
cross-language contract even though node can't run in this image.
"""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
FIXTURES = REPO / "visualizer" / "test" / "fixtures"
sys.path.insert(0, str(REPO / "tools"))

from cm3p_tpu import native  # noqa: E402


@pytest.fixture(scope="module")
def dataset():
    rows = json.loads((FIXTURES / "dataset.json").read_text())
    emb = np.asarray([r["embedding"] for r in rows], np.float32)
    return rows, emb


@pytest.fixture(scope="module")
def goldens():
    return json.loads((FIXTURES / "goldens.json").read_text())


def test_fixture_regeneration_deterministic(dataset, goldens):
    from make_visualizer_fixtures import QUERY_CASES, make_dataset

    rows, _ = dataset
    assert rows == json.loads(json.dumps(make_dataset()))
    assert [q["query"] for q in goldens["queries"]] == QUERY_CASES


def test_native_kmeans_reproduces_golden(dataset, goldens):
    _, emb = dataset
    labels = native.calculate_kmeans(emb, goldens["k"], seed=goldens["kmeans_seed"])
    assert [int(x) for x in labels] == goldens["kmeans_labels"]


def test_native_pca_reproduces_golden(dataset, goldens):
    _, emb = dataset
    pca = native.calculate_pca(emb, seed=goldens["pca_seed"])
    expect = np.asarray(goldens["pca_points"], np.float32)
    np.testing.assert_allclose(pca, expect, atol=2e-3)


def test_native_knn_reproduces_golden(dataset, goldens):
    _, emb = dataset
    norm = native.normalize_vectors(emb)
    idx, dist = native.find_nearest_neighbors(
        norm, query_idx=goldens["knn"]["query"], n_neighbors=goldens["knn"]["k"]
    )
    assert [int(i) for i in idx] == goldens["knn"]["indices"]
    np.testing.assert_allclose(dist, goldens["knn"]["distances"], atol=1e-5)


def test_numpy_fallbacks_reproduce_golden(dataset, goldens):
    """The pure-numpy fallbacks (the python analogue of the JS fallbacks)
    agree with the C++ goldens — the three implementations share the seeded
    LCG / max-distance-init / <=10-Lloyd-iteration contract."""
    _, emb = dataset
    labels = native._kmeans_numpy(emb, goldens["k"], goldens["kmeans_seed"])
    assert [int(x) for x in labels] == goldens["kmeans_labels"]
    pca = native._pca_numpy(emb, goldens["pca_seed"])
    np.testing.assert_allclose(pca, np.asarray(goldens["pca_points"]), atol=2e-3)


def test_query_cases_reproduce_golden(dataset, goldens):
    from make_visualizer_fixtures import eval_query

    rows, _ = dataset
    for case in goldens["queries"]:
        assert eval_query(rows, case["query"]) == case["expected"], case["query"]


def test_query_cases_cover_operators(goldens):
    text = " ".join(c["query"] for c in goldens["queries"])
    for op in ("==", "!=", ">", ">=", "<", "<=", "contains", "AND", ";"):
        assert op in text, f"operator {op} uncovered"


def test_native_recluster_k5_reproduces_golden(dataset, goldens):
    _, emb = dataset
    labels = native.calculate_kmeans(emb, 5, seed=goldens["kmeans_seed"])
    assert [int(x) for x in labels] == goldens["kmeans_labels_k5"]
