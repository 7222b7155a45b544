"""The local oracle gate's value canonicalization must be at least as
strict as the driver's — in particular it must NOT collapse Decimal
values through a float roundtrip (VERDICT r4: a float roundtrip masks
last-digit differences at 10-digit-plus-8-decimal magnitudes, exactly
the class the driver's hasher can distinguish)."""

from __future__ import annotations

import datetime as dt
import decimal
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_oracles import canon, table_hash  # noqa: E402

D = decimal.Decimal


def test_canon_decimal_distinguishes_last_digit_beyond_float():
    """The exact shape that float-roundtrips to equality: ten integer
    digits plus eight decimals, perturbed in the final digit."""
    a = D("1234567890.11540000")
    b = D("1234567890.11540001")
    assert float(a) == float(b)  # a float roundtrip CANNOT tell these apart
    assert canon(a) != canon(b)


def test_canon_decimal_is_exact_scaled_string():
    assert canon(D("3024008727.89070000")) == "3024008727.89070000"
    assert canon(D("-0.50")) == "-0.50"
    # scale is part of the canonical form (engines that agree on the
    # value but not the output scale must be caught, then pinned)
    assert canon(D("1.10")) != canon(D("1.1"))


def test_canon_decimal_no_scientific_notation():
    # str(Decimal) can produce exponent forms; the canon must not
    assert canon(D("1E+2")) == "100"
    assert canon(D("1.5E-7")) == "0.00000015"


def test_table_hash_fails_on_perturbed_decimal_last_digit():
    cols = ["k", "total"]
    rows_a = [("A", D("1234567890.11540000"))]
    rows_b = [("A", D("1234567890.11540001"))]
    assert table_hash(cols, rows_a) != table_hash(cols, rows_b)


def test_canon_other_types_unchanged():
    assert canon(None) == "NULL"
    assert canon(True) == "True"
    assert canon(0.125) == repr(round(0.125, 9))
    assert canon(dt.date(2024, 1, 2)) == "2024-01-02"
    assert canon([1, D("2.50")]) == "[1,2.50]"
