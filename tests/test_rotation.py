"""Round-7 rotation audit: the driver hash-verifies a 50-spec PREFIX of
``workload.SPECS`` per round, so correctness evidence only accrues to
specs that have actually been inside a window — and only stays valid
while the spec's implementation is unchanged.

The round-7 policy (VERDICT r6 task 1) is *changed-since-green*: every
oracled spec that was never driver-verified, or whose content digest
(dep-function sources + referenced module-level constants + oracle SQL,
see ``tools/rotation_audit.py``) differs from the digest it had at its
last driver-green round boundary, MUST sit inside the current window or
the documented ``_POST_R*_ADDITIONS`` overflow queue.  This makes every
future window self-auditing: touch a file mid-round and the affected
specs demand a window slot before the round can ship.
"""

from __future__ import annotations

import pathlib
import sys

from nbi_oedi_etl_spark import workload

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO / "tools"))

import rotation_audit  # noqa: E402


def test_window_is_prefix_and_fully_oracled():
    names = [s.name for s in workload.SPECS]
    assert names[:50] == workload._R15_WINDOW
    by_name = {s.name: s for s in workload.SPECS}
    # oracle-backed except the three documented rows-only CDC streams
    # (the driver records their weaker row check — VERDICT r12 task 1)
    assert all(
        by_name[n].oracle is not None or n in workload._ROWS_ONLY_WINDOW_OK
        for n in workload._R15_WINDOW
    )
    assert all(by_name[n].oracle is None for n in workload._ROWS_ONLY_WINDOW_OK)


def test_changed_since_green_debt_is_inside_window():
    """The codified rotation policy: stale evidence => window slot.

    Uses the committed per-round digest snapshots
    (tools/spec_digests/r{N}.json); if a boundary snapshot is missing it
    is rebuilt from a temporary git worktree at that round's driver
    commit, so the check works on any checkout with history.
    """
    if not list(_REPO.glob("CORRECTNESS_r[0-9]*.json")):
        return  # fresh checkout without driver artifacts
    debt = rotation_audit.verification_debt()
    allowed = set(workload._R15_WINDOW) | set(workload._POST_R15_ADDITIONS)
    outside = sorted(set(debt) - allowed)
    assert outside == [], (
        "specs with stale driver evidence not scheduled for re-verification: "
        + ", ".join(f"{n} ({debt[n]})" for n in outside)
    )


def test_digests_ignore_memo_cache_warmth():
    """v3 regression pin: module-level memo caches (mutable dicts) must
    not enter the digest — v2 hashed them by value, so running queries
    (warming caches) spuriously flagged the minhash/dedup specs when the
    audit ran late in a pytest session."""
    digests_cold = rotation_audit.spec_digests(_REPO)
    # simulate cache warmth without a Spark session: mutate a module-level
    # dict that spec functions reference
    from nbi_oedi_etl_spark import workload_ext

    poisoned = []
    for name, val in vars(workload_ext).items():
        if isinstance(val, dict) and not name.startswith("__"):
            val["__digest_warmth_probe__"] = object()
            poisoned.append(val)
    try:
        digests_warm = rotation_audit.spec_digests(_REPO)
    finally:
        for val in poisoned:
            val.pop("__digest_warmth_probe__", None)
    assert digests_cold == digests_warm


def test_window_covers_post_round_additions():
    # anything registered behind a frozen window must enter the NEXT one
    assert set(workload._POST_R7_ADDITIONS) <= set(workload._R8_WINDOW)
    assert set(workload._POST_R8_ADDITIONS) <= set(workload._R9_WINDOW)
    assert set(workload._POST_R9_ADDITIONS) <= set(workload._R10_WINDOW)
    assert set(workload._POST_R10_ADDITIONS) <= set(workload._R11_WINDOW)
    assert set(workload._POST_R11_ADDITIONS) <= set(workload._R12_WINDOW)
    assert set(workload._POST_R12_ADDITIONS) <= set(workload._R13_WINDOW)
    assert set(workload._POST_R13_ADDITIONS) <= set(workload._R14_WINDOW)
    assert set(workload._POST_R14_ADDITIONS) <= set(workload._R15_WINDOW)
    assert len(workload._R15_WINDOW) == 50
    assert len(set(workload._R15_WINDOW)) == 50
