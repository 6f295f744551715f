"""Reproduction of the reference aggregation pad-row bug (PARITY.md
deviation 0).

The reference allocates n_rows = max(n_children, 8).next_power_of_two()
(agg/trace.rs:398) and fills the accumulator columns PRE-child: row i
carries the accumulator value BEFORE child i's contribution
(agg/trace.rs:615 sets v_units_acc, :646 increments it afterwards).
Its AIR then asserts v_units_acc[last] == v_units_total and
child_count_acc[last] == children_count (agg/air.rs get_assertions),
with the C1/C11 accumulator-chain transitions gated OFF the last row
(agg/air.rs:180-186).

Consequence: when n_children is an exact power of two >= 8 (including
the 16 segments of the reference's own rollup-bench config), there is
no pad row after the last child — the last row holds the accumulator
value BEFORE the final child, the boundary assertion compares it to the
full total, and the reference's own trace violates its own AIR.  This
framework pads to max(n_children + 1, 8).next_power_of_two()
(agg/aggregate.py build_agg_trace) so at least one pad row carries the
completed accumulator.

This file reproduces the failure arithmetically with both padding
schedules against the exact assertion/transition semantics above.
"""

import pytest


def _build_acc_columns(n_children: int, v_units: list, pad_plus_one: bool):
    """Fill (v_units_acc, child_count_acc, v_units_child, seg_first)
    exactly as the reference trace builder does, under either padding
    schedule."""
    base = max(n_children + 1, 8) if pad_plus_one else max(n_children, 8)
    n_rows = 1 << (base - 1).bit_length()
    v_acc, c_acc = 0, 0
    vu_acc_col, cc_acc_col, vu_child_col, first_col = [], [], [], []
    for i in range(n_children):
        vu_acc_col.append(v_acc)            # PRE-child value (trace.rs:615)
        cc_acc_col.append(c_acc)
        vu_child_col.append(v_units[i])
        first_col.append(1)
        v_acc += v_units[i]                 # incremented after (trace.rs:646)
        c_acc += 1
    for _ in range(n_children, n_rows):     # pad rows (trace.rs:668)
        vu_acc_col.append(v_acc)
        cc_acc_col.append(c_acc)
        vu_child_col.append(0)
        first_col.append(0)
    return n_rows, vu_acc_col, cc_acc_col, vu_child_col, first_col


def _check_air(n_rows, vu_acc, cc_acc, vu_child, first,
               v_total: int, n_children: int) -> list:
    """Evaluate the reference's assertions + C1/C11 transitions; returns
    the list of violations."""
    bad = []
    # boundary assertions (agg/air.rs get_assertions)
    if vu_acc[0] != 0:
        bad.append("v_units_acc[0] != 0")
    if vu_acc[n_rows - 1] != v_total:
        bad.append(f"v_units_acc[last] = {vu_acc[n_rows - 1]} "
                   f"!= v_units_total = {v_total}")
    if cc_acc[0] != 0:
        bad.append("child_count_acc[0] != 0")
    if cc_acc[n_rows - 1] != n_children:
        bad.append(f"child_count_acc[last] = {cc_acc[n_rows - 1]} "
                   f"!= children_count = {n_children}")
    # C1/C11 transitions, gated to non-last rows (agg/air.rs:180-186):
    # acc[i+1] == acc[i] + seg_first[i] * contribution[i]
    for i in range(n_rows - 1):
        if vu_acc[i + 1] != vu_acc[i] + first[i] * vu_child[i]:
            bad.append(f"C1 violated at row {i}")
        if cc_acc[i + 1] != cc_acc[i] + first[i]:
            bad.append(f"C11 violated at row {i}")
    return bad


@pytest.mark.parametrize("n_children", [8, 16])
def test_reference_padding_unsatisfiable_at_pow2(n_children):
    """max(n,8).next_power_of_two() leaves no pad row at power-of-two
    child counts: the reference's own boundary assertions fail."""
    v_units = [100 + i for i in range(n_children)]
    cols = _build_acc_columns(n_children, v_units, pad_plus_one=False)
    bad = _check_air(*cols, v_total=sum(v_units), n_children=n_children)
    assert any("v_units_acc[last]" in b for b in bad), bad
    assert any("child_count_acc[last]" in b for b in bad), bad


@pytest.mark.parametrize("n_children", [2, 7, 8, 9, 16])
def test_plus_one_padding_satisfiable(n_children):
    """This framework's n+1 padding satisfies the same AIR at every
    child count, including the power-of-two cases."""
    v_units = [100 + i for i in range(n_children)]
    cols = _build_acc_columns(n_children, v_units, pad_plus_one=True)
    bad = _check_air(*cols, v_total=sum(v_units), n_children=n_children)
    assert bad == [], bad


@pytest.mark.parametrize("n_children", [3, 5, 7, 12])
def test_reference_padding_fine_off_pow2(n_children):
    """Off power-of-two counts the reference schedule has pad rows and
    satisfies its AIR — the bug only bites at 8, 16, 32, ... children
    (the rollup-bench config is exactly 16 segments)."""
    v_units = [100 + i for i in range(n_children)]
    cols = _build_acc_columns(n_children, v_units, pad_plus_one=False)
    bad = _check_air(*cols, v_total=sum(v_units), n_children=n_children)
    assert bad == [], bad
