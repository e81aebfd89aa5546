"""Regenerate tests/fixtures/regression_tiny.npz — golden outputs of the tiny
model (fixed seeds) at every pipeline stage.

Run from the repo root after an INTENTIONAL numerics change:
    python tests/make_regression_fixtures.py
and commit the refreshed fixture.  test_regression.py compares the live code
against these values, catching unintended numerical drift from refactors
(e.g. attention/KV-layout rewrites) — the oracle-fixture pattern of the
reference's tokenizer tests (SURVEY §4) applied to the whole stack.
"""

import os
import sys

_TESTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TESTS))  # repo root (the package)
sys.path.insert(0, _TESTS)  # tests dir (conftest_util)

import conftest_util  # noqa: E402  (shared tiny-model builder)


def main() -> None:
    import numpy as np

    bundle = conftest_util.tiny_regression_outputs()
    path = os.path.join(os.path.dirname(__file__), "fixtures", "regression_tiny.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **bundle)
    print(f"wrote {path}:")
    for k, v in bundle.items():
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
