"""Property-based tests for the variant-calling kernel.

The killer invariant: the emitted events are a complete, non-overlapping
edit script — replaying them against the reference must reconstruct the
variant sequence exactly (both gap-stripped). Hypothesis drives random
alignments through every branch combination the golden fixtures can't
enumerate."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from gisaid_pipeline_functions_spark.operators.variant_caller import (
    call_variants_row,
    reference_positions,
)

AA = "ACDEFGHIKLMNPQRSTVWY"


@st.composite
def alignments(draw):
    """Random (ref, var) aligned pairs: per column, choose one of
    match / sub / del / ins / double-gap, weighted toward matches."""
    n = draw(st.integers(min_value=1, max_value=40))
    ref, var = [], []
    for _ in range(n):
        kind = draw(
            st.sampled_from(
                ["match"] * 5 + ["sub", "del", "ins", "gap2"]
            )
        )
        a = draw(st.sampled_from(AA))
        b = draw(st.sampled_from(AA))
        if kind == "match":
            ref.append(a), var.append(a)
        elif kind == "sub":
            ref.append(a), var.append(b if b != a else AA[(AA.index(a) + 1) % 20])
        elif kind == "del":
            ref.append(a), var.append("-")
        elif kind == "ins":
            ref.append("-"), var.append(b)
        else:
            ref.append("-"), var.append("-")
    return "".join(ref), "".join(var)


def replay(ref: str, events: list[tuple]) -> str:
    """Apply the edit script to the aligned reference: for every event,
    splice Var residues over the event's MSA span."""
    out = list(ref)
    for ev in events:
        (etype, _code, _ref_aa, var_aa, msa_start, msa_end, _rs, _re) = ev
        start = msa_start - 1
        end = (msa_end - 1) if msa_end is not None else start
        # clear the span, then write the variant residues (gap-stripped)
        for i in range(start, end + 1):
            out[i] = "-"
        payload = (var_aa or "").replace("-", "")
        for k, ch in enumerate(payload):
            out[start + k] = ch
    return "".join(out).replace("-", "")


@given(alignments())
@settings(max_examples=300, deadline=None)
def test_events_reconstruct_variant(pair):
    ref, var = pair
    try:
        events = list(call_variants_row(ref, reference_positions(ref), var))
    except ValueError:
        # only legal for an insertion with no reference residue anywhere
        assert ref.replace("-", "") == ""
        return
    assert replay(ref, events) == var.replace("-", ""), (
        f"ref={ref} var={var} events={events}"
    )


@given(alignments())
@settings(max_examples=300, deadline=None)
def test_event_invariants(pair):
    ref, var = pair
    ref_pos = reference_positions(ref)
    try:
        events = list(call_variants_row(ref, ref_pos, var))
    except ValueError:
        return
    L = len(ref)
    n_ref = len(ref.replace("-", ""))
    spans = []
    for ev in events:
        (etype, code, ref_aa, var_aa, msa_start, msa_end, rs, re_) = ev
        assert etype in ("sub", "del", "ins", "ext", "delins")
        assert 1 <= msa_start <= L
        if msa_end is not None:
            assert msa_start <= msa_end <= L
        if rs is not None:
            assert 1 <= rs <= n_ref
        if re_ is not None:
            assert rs is None or rs <= re_
        assert code and code[0] != "-"
        spans.append((msa_start, msa_end or msa_start))
    # events are ordered and non-overlapping along the alignment
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 < s2
