"""Property suite for the pure WordPiece kernels (no Spark session):
the greedy matcher and the driver-side trainer loop."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from example_dms_dataexport_spark.operators.wordpiece import (
    _train_local_wp,
    _wp_fuse,
    greedy_encode,
)

words = st.text(alphabet="abcdef", min_size=1, max_size=12)


def _vocab_of(pieces):
    vset = frozenset(pieces)
    max_len = max((len(v) for v in vset), default=1)
    return vset, max_len


@given(w=words, extra=st.lists(words, max_size=8))
@settings(max_examples=200, deadline=None)
def test_encode_reconstructs_or_unks(w, extra):
    """With all single chars in vocab plus arbitrary extra pieces, the
    encoding always reconstructs the word exactly; each piece is
    in-vocab with correct ## placement."""
    base = {c for c in "abcdef"} | {f"##{c}" for c in "abcdef"}
    vocab = base | set(extra) | {"##" + e for e in extra}
    vset, max_len = _vocab_of(vocab)
    pieces = greedy_encode(w, vset, max_len)
    assert pieces != ["[UNK]"]
    assert not pieces[0].startswith("##")
    assert all(p.startswith("##") for p in pieces[1:])
    recon = pieces[0] + "".join(p[2:] for p in pieces[1:])
    assert recon == w
    assert all(p in vset for p in pieces)


@given(w=words)
@settings(max_examples=100, deadline=None)
def test_encode_unks_outside_alphabet(w):
    """A vocab that cannot cover some character yields whole-word UNK,
    never a partial encoding."""
    vset, max_len = _vocab_of({"a", "##a"})
    pieces = greedy_encode(w, vset, max_len)
    if set(w) <= {"a"}:
        assert pieces == ["a"] + ["##a"] * (len(w) - 1)
    else:
        assert pieces == ["[UNK]"]


@given(w=words, piece=words)
@settings(max_examples=150, deadline=None)
def test_greedy_prefers_longest(w, piece):
    """If the whole word is in vocab, the encoding is the single
    whole-word piece regardless of what else the vocab holds."""
    vocab = {w, piece, "##" + piece} | {c for c in w} | {
        "##" + c for c in w
    }
    vset, max_len = _vocab_of(vocab)
    assert greedy_encode(w, vset, max_len) == [w]


@given(
    corpus=st.lists(
        st.tuples(words, st.integers(min_value=1, max_value=20)),
        min_size=1,
        max_size=12,
    ),
    merges=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=60, deadline=None)
def test_trainer_invariants(corpus, merges):
    """Trainer merges are well-formed: scores positive and within each
    round's feasible range, counts >= the floor, fused pieces carry at
    most a leading ## marker, and applying a merge never increases the
    symbol count of any word."""
    rows = [
        (
            [w[0]] + ["##" + c for c in w[1:]],
            cnt,
        )
        for w, cnt in corpus
    ]
    out = _train_local_wp([(list(s), c) for s, c in rows], merges, 1)
    assert len(out) <= merges
    for l, r, score, n in out:
        assert n >= 1
        assert score > 0
        fused = _wp_fuse(l, r)
        assert "####" not in fused
        assert fused.count("##") <= 1
        if fused.startswith("##"):
            assert l.startswith("##")
