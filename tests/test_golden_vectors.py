"""The authoritative behavioral suite: replay every reference golden vector
(test_vectors/{auth,no_auth}, 92 files) through the host→guest pipeline and
assert exit-code parity (script/run.sh:85-96 semantics)."""

import pytest

from .vector_runner import REFERENCE_VECTORS, iter_vectors, run_vector

VECTORS = list(iter_vectors())


@pytest.mark.skipif(not REFERENCE_VECTORS.is_dir(), reason="reference vectors not mounted")
@pytest.mark.parametrize(
    "auth,path",
    VECTORS,
    ids=[f"{'auth' if a else 'no_auth'}-{p.parent.name}-{p.stem}" for a, p in VECTORS],
)
def test_golden_vector(auth, path):
    outcome = run_vector(path, auth)
    if outcome is None:
        pytest.skip("vector disabled")
    assert outcome.ok, (
        f"expected exit {outcome.expected}, got {outcome.got}: {outcome.detail[:500]}"
    )


def test_census():
    """92 vectors, 35 expecting exit 0 (SURVEY.md §4)."""
    import json

    if not REFERENCE_VECTORS.is_dir():
        pytest.skip("reference vectors not mounted")
    total = sum(1 for _ in VECTORS)
    zeros = sum(
        1
        for _, p in VECTORS
        if json.loads(p.read_text())["params"]["expected_exit_code"] == 0
    )
    assert total == 92
    assert zeros == 35
