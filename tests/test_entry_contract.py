"""Driver-contract invariants for ``__spark_entry__``.

The driver checks a bounded prefix of ``queries()`` per round, so the
iteration order is part of the verification strategy: changed queries
first, never-driver-checked next, already-verified last (see
``__spark_entry__._catalog_order``). These tests pin that contract
without running Spark.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402


def _driver_rows() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path, encoding="utf-8") as fh:
            seen.update(json.load(fh))
    return seen


def _active_reverify() -> list[str]:
    """The re-verify names that have not yet retired (no green row in a
    round >= _REVERIFY_SINCE) — mirrors ``_catalog_order``'s head."""
    _, confirmed = entry_mod._driver_rows()
    return [
        n
        for n in entry_mod._REVERIFY_FIRST
        if n in set(entry_mod.queries()) and n not in confirmed
    ]


def test_queries_and_oracles_share_names_and_order():
    q = list(entry_mod.queries())
    o = list(entry_mod.oracle_sql())
    assert set(o) <= set(q)
    # oracle_sql preserves queries() relative order (driver zips by name,
    # but keeping the orders aligned makes the files diffable)
    pos = {n: i for i, n in enumerate(q)}
    assert o == sorted(o, key=pos.__getitem__)


def test_catalog_order_is_a_permutation_of_the_catalog():
    q = list(entry_mod.queries())
    assert len(q) == len(set(q))
    assert set(q) == set(entry_mod._catalog_order())


def test_reverify_first_queries_lead_when_driver_rows_exist():
    if not _driver_rows():
        # fresh checkout: plain alphabetical fallback
        q = list(entry_mod.queries())
        assert q == sorted(q)
        return
    q = list(entry_mod.queries())
    expected_head = _active_reverify()
    assert q[: len(expected_head)] == expected_head


def test_never_driver_checked_queries_precede_verified_remainder():
    seen = _driver_rows()
    if not seen:
        return
    q = list(entry_mod.queries())
    tail = q[len(_active_reverify()) :]
    # tail = [never-checked block][already-verified block], each sorted
    flags = [n in seen for n in tail]
    assert flags == sorted(flags)  # False(never) before True(verified)
    never = [n for n in tail if n not in seen]
    rest = [n for n in tail if n in seen]
    assert never == sorted(never)
    assert rest == sorted(rest)


def test_reverify_entries_retire_once_reconfirmed(monkeypatch):
    """A green row in a round >= _REVERIFY_SINCE drops the name from the
    head so it stops consuming driver sample slots in later rounds."""
    q = set(entry_mod.queries())
    target = next(n for n in entry_mod._REVERIFY_FIRST if n in q)

    # simulate: every catalog name seen, `target` re-confirmed since r5
    monkeypatch.setattr(
        entry_mod, "_driver_rows", lambda: (set(q), {target})
    )
    order = entry_mod._catalog_order()
    head = [n for n in entry_mod._REVERIFY_FIRST if n in q and n != target]
    assert order[: len(head)] == head
    assert target not in order[: len(head)]
    assert target in order  # still in the catalog, just not floated

    # not yet re-confirmed -> still floated
    monkeypatch.setattr(entry_mod, "_driver_rows", lambda: (set(q), set()))
    order = entry_mod._catalog_order()
    full_head = [n for n in entry_mod._REVERIFY_FIRST if n in q]
    assert order[: len(full_head)] == full_head


def test_driver_rows_counts_rows_only_success_as_confirmed(tmp_path, monkeypatch):
    """err == "no_oracle" with a non-null rows count is the strongest
    signal a rows-only query can get; it must retire the float too,
    while a red hash row must NOT."""
    payload = {
        "q_rows_only": {"hash_match": None, "err": "no_oracle", "spark_rows": 3},
        "q_red": {"hash_match": False, "err": None, "spark_rows": 3},
        "q_green": {"hash_match": True, "err": None, "spark_rows": 3},
    }
    rnd = entry_mod._REVERIFY_SINCE
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(payload))
    monkeypatch.setattr(entry_mod, "__file__", str(tmp_path / "e.py"))
    seen, confirmed = entry_mod._driver_rows()
    assert seen == {"q_rows_only", "q_red", "q_green"}
    assert confirmed == {"q_rows_only", "q_green"}


def test_reverify_list_names_exist_in_catalog():
    q = set(entry_mod.queries())
    missing = [n for n in entry_mod._REVERIFY_FIRST if n not in q]
    assert not missing, missing
