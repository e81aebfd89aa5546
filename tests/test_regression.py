"""Golden-output regression: live code vs committed fixtures.

Catches unintended numerical drift anywhere in the stack (prompt builder,
talker, MTP, vocoder, mel, speaker encoder).  After an INTENTIONAL numerics
change, regenerate with `python tests/make_regression_fixtures.py` and commit
the new fixture alongside the change.
"""

import os

import numpy as np
import pytest

from conftest_util import tiny_regression_outputs

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "regression_tiny.npz")

# reduction-order differences across XLA versions allow small drift; token
# ids and shapes must match exactly
TOL = dict(rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def recorded():
    if not os.path.exists(FIXTURE):
        pytest.skip("regression fixture not generated")
    with np.load(FIXTURE) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="module")
def live():
    return tiny_regression_outputs()


@pytest.mark.parametrize(
    "key",
    [
        "prompt_embeds",
        "trailing",
        "prefill_logits",
        "audio_head",
        "mel",
        "speaker_embed",
    ],
)
def test_tensor_matches(recorded, live, key):
    assert recorded[key].shape == live[key].shape, key
    np.testing.assert_allclose(live[key], recorded[key], **TOL, err_msg=key)


def test_greedy_frames_exact(recorded, live):
    np.testing.assert_array_equal(live["greedy_frames"], recorded["greedy_frames"])
    np.testing.assert_array_equal(live["frame_valid"], recorded["frame_valid"])
