"""Property-based tests for the RFC-6902 implementation — the kernel
under twin updates (D3), component patches (D9), and the CloudEvents
EventNotification diff (S6).  Strategy: for ANY two JSON documents,
``apply_patch(old, make_patch(old, new)) == new``.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pg_age_digitaltwins_spark.functions.jsonpatch import apply_patch, make_patch

# JSON values: bounded depth/width so hypothesis explores structure, not size
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**6), max_value=10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=8),
)
_keys = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), whitelist_characters="_/~$"),
    min_size=1,
    max_size=6,
)
_json = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(_keys, children, max_size=4),
    ),
    max_leaves=12,
)
_docs = st.dictionaries(_keys, _json, max_size=5)


@settings(max_examples=300, deadline=None)
@given(old=_docs, new=_docs)
def test_diff_patch_roundtrip(old, new):
    patch = make_patch(old, new)
    assert apply_patch(old, patch) == new


@settings(max_examples=200, deadline=None)
@given(doc=_docs)
def test_identity_diff_is_empty(doc):
    assert make_patch(doc, doc) == []


@settings(max_examples=200, deadline=None)
@given(old=_docs, new=_docs)
def test_patch_does_not_mutate_input(old, new):
    import copy

    snapshot = copy.deepcopy(old)
    apply_patch(old, make_patch(old, new))
    assert old == snapshot
