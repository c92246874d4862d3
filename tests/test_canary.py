"""The adjudicated-drift canary (VERDICT r8 #6) is only meaningful if
its per-round selection is reproducible — a cherry-pickable canary
proves nothing. Pin the selection function: deterministic per round,
drawn from the oracle-backed adjudicated pool, and actually different
across rounds (so over rounds the canary walks the old-key space)."""

from __future__ import annotations

import importlib.util
import pathlib

_TOOL = (
    pathlib.Path(__file__).resolve().parent.parent
    / "tools"
    / "canary_adjudicated.py"
)
_spec = importlib.util.spec_from_file_location("canary_adjudicated", _TOOL)
canary = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(canary)


def test_selection_is_deterministic_per_round():
    assert canary.canary_keys(9) == canary.canary_keys(9)


def test_selection_draws_from_adjudicated_oracle_backed_pool():
    from oke_cassandra_spark_locality_demo_spark import registry

    oracles = registry.all_oracles()
    keys = canary.canary_keys(9)
    assert len(keys) == canary.CANARY_SIZE
    assert len(set(keys)) == canary.CANARY_SIZE
    for k in keys:
        assert k in registry._DRIVER_ADJUDICATED, k
        assert k in oracles, k


def test_selection_varies_across_rounds():
    """Not a hard API guarantee of sample(), but with a 300+ key pool
    the chance of two seeds drawing identical 5-sets is negligible —
    if this ever fails, the selection is not actually walking the
    space and the canary is weaker than ROUNDLOG claims."""
    draws = {tuple(canary.canary_keys(r)) for r in range(9, 21)}
    assert len(draws) == 12


def test_current_round_selection_matches_roundlog():
    """ROUNDLOG r12 names these five keys as the round's canary; the
    recorded claim and the tool must never drift apart. The pin is
    per-round against the adjudicated pool at that round's HEAD — the
    pool grows when a round's sampled keys are appended to
    _DRIVER_ADJUDICATED, so the pinned round advances with it (the r11
    pin was computed over the 400-key post-rotation pool; this one
    over the full 401-key pool — 394 of them oracle-backed — after
    the r12 playbook appended q_multimodal_decode_real)."""
    assert canary.canary_keys(12) == [
        "q_source_schema_evolution",
        "q_intersect",
        "q_tpch_q18",
        "q_stats_runs_test",
        "q_tpch_q22",
    ]
