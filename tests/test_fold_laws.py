"""Property-based laws for the fold combinator algebra (Fold.scala:24-122
semantics, checked with hypothesis instead of the reference's example specs)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_flow_spark.operators.fold import fold_option

recs = st.lists(st.fixed_dictionaries({"n": st.integers(-50, 50)}), max_size=30)


def run(fold, records, s=None):
    for r in records:
        s = fold(s, r)
    return s


sum_fold = fold_option(lambda s, r: (s or 0) + r["n"])


@settings(max_examples=200, deadline=None)
@given(recs)
def test_contramap_composes(records):
    """contramap(f).contramap(g) == contramap(g∘f on input)."""
    double = lambda r: {"n": r["n"] * 2}
    add1 = lambda r: {"n": r["n"] + 1}
    lhs = run(sum_fold.contramap(double).contramap(add1), records)
    rhs = run(sum_fold.contramap(lambda r: double(add1(r))), records)
    assert lhs == rhs


@settings(max_examples=200, deadline=None)
@given(recs)
def test_filter_skips_without_state_change(records):
    """filter(p): records failing p leave state untouched (Fold.scala:94-106)."""
    keep_even = sum_fold.filter(lambda s, r: r["n"] % 2 == 0)
    expected = run(sum_fold, [r for r in records if r["n"] % 2 == 0])
    assert run(keep_even, records) == expected


@settings(max_examples=200, deadline=None)
@given(recs)
def test_contra_collect_is_filter_plus_map(records):
    """contraCollect(pf) == filter(defined) then contramap (Fold.scala:109-113)."""
    pf = lambda r: {"n": r["n"] * 3} if r["n"] > 0 else None
    lhs = run(sum_fold.contra_collect(pf), records)
    rhs = run(sum_fold, [{"n": r["n"] * 3} for r in records if r["n"] > 0])
    assert lhs == rhs


@settings(max_examples=200, deadline=None)
@given(recs)
def test_transform_state_roundtrip(records):
    """transformState(wrap)(unwrap) with inverse functions preserves the fold
    result under the wrap (Fold.scala:47-67)."""
    wrapped = sum_fold.transform_state(lambda s: {"v": s}, lambda t: t["v"])
    plain = run(sum_fold, records)
    assert run(wrapped, records) == (None if plain is None else {"v": plain})


@settings(max_examples=200, deadline=None)
@given(recs)
def test_and_then_sequences_on_same_input(records):
    """productR: both folds see every record; the second folds over the
    first's output state (Fold.scala:78-91)."""
    count_fold = fold_option(lambda s, r: (s if isinstance(s, int) else 0) + 1)
    seq = sum_fold.and_then(count_fold)
    # after each record: state := count applied to sum's state
    s = None
    for r in records:
        s = count_fold(sum_fold(s, r), r)
    assert run(seq, records) == s


@settings(max_examples=200, deadline=None)
@given(recs, st.integers(0, 49))
def test_handle_error_with_recovers(records, bomb):
    """handleErrorWith: the handler sees (state, record, error) and its result
    becomes the state; non-throwing records are untouched (Fold.scala:119-122)."""

    def step(s, r):
        if r["n"] == bomb:
            raise ValueError("boom")
        return (s or 0) + r["n"]

    recovered = fold_option(step).handle_error_with(lambda s, r, e: s)
    expected = run(sum_fold, [r for r in records if r["n"] != bomb])
    assert run(recovered, records) == expected
