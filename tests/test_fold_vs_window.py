"""Differential proof: the registered fold-semantic plans (Window/agg
built-ins — the 100 TB plans) are row-identical to the same semantics run
through the real fold machinery (operators.keyed, the reference's
FoldToState hot path).  Chain of evidence: fold == window plan == DuckDB
oracle (test_oracle_parity covers the second link)."""

from __future__ import annotations

import math

import pytest

from kafka_flow_spark.plans import events as ev
from tests.conftest import SF_SMALL

PAIRS = [
    (ev.q_fold_running_totals, ev.fold_running_totals_via_fold),
    (ev.q_fold_reset_on_error, ev.fold_reset_on_error_via_fold),
    (ev.q_fold_final_state, ev.fold_final_state_via_fold),
    (ev.q_funnel_view_click_purchase, ev.funnel_via_fold),
]


def _rows(df):
    out = []
    for r in df.collect():
        d = r.asDict()
        out.append(tuple(
            round(v, 9) if isinstance(v, float) and not math.isnan(v) else v
            for _, v in sorted(d.items())
        ))
    return sorted(out)


@pytest.mark.parametrize("window_fn,fold_fn", PAIRS, ids=[p[0].__name__ for p in PAIRS])
def test_window_plan_equals_fold_machinery(spark, window_fn, fold_fn):
    assert _rows(window_fn(spark, SF_SMALL)) == _rows(fold_fn(spark, SF_SMALL))
