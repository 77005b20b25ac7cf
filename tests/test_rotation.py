"""Round-6 rotation audit: the driver hash-verifies a 50-spec PREFIX of
``workload.SPECS`` per round, so correctness evidence only accrues to
specs that have actually been inside a window. This pins the r6 window's
contract: it must contain every oracled spec that rounds 1-5 never
verified (the r5 queue plus multimodal_jpeg_features and
stateful_session_stats), leaving zero verification debt after this round.
"""

from __future__ import annotations

import json
import pathlib

from nbi_oedi_etl_spark import workload

_REPO = pathlib.Path(__file__).resolve().parent.parent


def _driver_verified_names() -> set[str]:
    names: set[str] = set()
    for path in sorted(_REPO.glob("CORRECTNESS_r0[1-5].json")):
        names |= set(json.loads(path.read_text()))
    return names


def test_window_is_prefix_and_fully_oracled():
    names = [s.name for s in workload.SPECS]
    assert names[:50] == workload._R6_WINDOW
    by_name = {s.name: s for s in workload.SPECS}
    assert all(by_name[n].oracle is not None for n in workload._R6_WINDOW)


def test_window_retires_all_verification_debt():
    verified = _driver_verified_names()
    if not verified:  # fresh checkout without driver artifacts
        return
    window = set(workload._R6_WINDOW) | set(workload._POST_R6_ADDITIONS)
    debt = [
        s.name
        for s in workload.SPECS
        if s.oracle is not None and s.name not in verified and s.name not in window
    ]
    assert debt == [], f"oracled specs never driver-verified and not in window: {debt}"


def test_r5_queue_fully_promoted():
    assert set(workload._R5_QUEUE) <= set(workload._R6_WINDOW)
