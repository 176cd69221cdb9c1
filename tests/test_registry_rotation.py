"""Pin the least-recently-verified rotation in the registry.

The driver checks only the first ``registry._DRIVER_WINDOW`` entries of
``queries()`` per round; this test asserts the ordering invariants that
keep union coverage complete across rounds.
"""

from __future__ import annotations

from evmtrace_etl_spark import registry


def test_never_verified_queries_lead_the_window():
    names = list(registry.queries())
    seen = registry._last_verified()
    rounds = [seen.get(n, 0) for n in names]
    # Non-decreasing: least-recently-verified strictly first.
    assert rounds == sorted(rounds)
    # Every never-verified query sits inside the driver window.
    never = [n for n in names if n not in seen]
    assert all(names.index(n) < registry._DRIVER_WINDOW for n in never)


def test_queries_and_oracles_share_an_order():
    q = list(registry.queries())
    o = list(registry.oracle_sql())
    assert o == [n for n in q if n in set(o)]


def test_rotation_survives_missing_correctness_files(monkeypatch, tmp_path):
    # In a checkout without driver artifacts the registry must still
    # return every query (ordering degrades to registration order).
    monkeypatch.setattr(registry, "_REPO_ROOT", str(tmp_path))
    names = list(registry.queries())
    assert len(names) == len(set(names)) >= 65


def test_hash_mismatch_keeps_query_in_rotation(monkeypatch, tmp_path):
    # A rows-green but HASH-red row must NOT count as verified — the
    # rotation would otherwise park a value-incorrect query outside the
    # driver's window for many rounds.
    import json

    (tmp_path / "CORRECTNESS_r9.json").write_text(json.dumps({
        "good": {"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None},
        "hash_bad": {"rows_match": True, "schema_match": True,
                     "hash_match": False, "err": None},
        "rows_only": {"rows_match": True, "err": None},
    }))
    monkeypatch.setattr(registry, "_REPO_ROOT", str(tmp_path))
    registry._VERIFIED_CACHE.clear()
    try:
        seen = registry._last_verified()
        assert seen.get("good") == 9
        assert "hash_bad" not in seen
        assert seen.get("rows_only") == 9  # weaker check still counts
    finally:
        registry._VERIFIED_CACHE.clear()
