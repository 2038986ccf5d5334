"""Property-based tests (hypothesis) for the round-trip-critical kernels."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_ray.kernels import assemble
from ocr_ray.kernels.hocr import parse_hocr
from ocr_ray.kernels.hocr_write import tree_to_hocr
from ocr_ray.schemas import pack_spans, unpack_spans

# word text: printable, no angle brackets (escaped by the writer anyway),
# non-empty after strip
_word_text = st.text(
    alphabet=string.ascii_letters + string.digits + "áéíóúç-'.,!«»",
    min_size=1, max_size=12,
).map(str.strip).filter(bool)


@st.composite
def trees(draw):
    n_pars = draw(st.integers(1, 3))
    tree = []
    y = 10
    for _ in range(n_pars):
        par = []
        for _ in range(draw(st.integers(1, 3))):
            line = []
            x = 10
            for _ in range(draw(st.integers(1, 5))):
                text = draw(_word_text)
                w = 10 * max(1, len(text))
                bottom = y + 20
                line.append(
                    {"text": text, "box": [float(x), float(y), float(x + w), float(bottom)],
                     "b": float(bottom), "confidence": draw(st.integers(0, 100))}
                )
                x += w + 5
            par.append(line)
            y += 30
        tree.append(par)
        y += 20
    return tree


@given(trees())
@settings(max_examples=40, deadline=None)
def test_hocr_roundtrip(tree):
    """tree → hOCR → parse == tree (with b = line bottom, our writer's
    baseline-0 convention; geometry here is integral so parsing is exact)."""
    parsed = parse_hocr(tree_to_hocr(tree))
    assert parsed == tree


@given(trees(), st.integers(0, 5))
@settings(max_examples=30, deadline=None)
def test_span_roundtrip_and_pack(tree, page_no):
    spans = assemble.tree_to_spans(tree, page_no=page_no)
    assert assemble.spans_to_tree(spans) == tree
    assert unpack_spans(pack_spans(spans)) == spans


@given(trees())
@settings(max_examples=30, deadline=None)
def test_text_assembly_consistency(tree):
    """page_text over the tree == joining the span words with the same
    rules — one shared definition of the bytes."""
    text = assemble.page_text(tree)
    expect = "\n\n".join(
        "\n".join(" ".join(w["text"] for w in line) for line in par) for par in tree
    ).strip()
    assert text == expect
    assert assemble.word_count(tree) == len(assemble.tree_to_spans(tree))


@given(trees(), st.one_of(st.none(), st.tuples(
    st.integers(0, 50), st.integers(0, 50)).map(lambda t: [float(t[0]), float(t[1]), 3000.0, 4000.0])))
@settings(max_examples=40, deadline=None)
def test_fast_and_dom_parser_agree(tree, segment_box):
    """The regex fast path and the DOM-walk parser must produce identical
    trees on well-formed hOCR, with and without segment offsets."""
    from ocr_ray.kernels.hocr import _dom_parse_hocr, _fast_parse

    hocr = tree_to_hocr(tree)
    assert _fast_parse(hocr, segment_box) == _dom_parse_hocr(hocr, segment_box)


# ------------------------------------------------ sketch kernel properties


@given(
    st.lists(st.sampled_from([f"w{i}" for i in range(40)]), max_size=600),
    st.integers(4, 32),
)
@settings(max_examples=60, deadline=None)
def test_misra_gries_properties(stream, cap):
    """For ANY stream and capacity: ≤ cap counters, retained ≤ true count,
    under-estimate ≤ n/(cap+1), and every item above that bound survives."""
    from collections import Counter

    from ocr_ray.kernels.sketches import misra_gries

    mg = misra_gries(iter(stream), cap)
    true = Counter(stream)
    bound = len(stream) / (cap + 1)
    assert len(mg) <= cap
    for w, c in mg.items():
        assert 0 < c <= true[w]
        assert true[w] - c <= bound
    for w, c in true.items():
        if c > bound:
            assert w in mg


@given(st.lists(st.binary(min_size=1, max_size=16), min_size=1,
                max_size=200, unique=True))
@settings(max_examples=30, deadline=None)
def test_minhash_vectorized_property(shingles):
    """Vectorized signature == big-int reference on arbitrary byte shingles
    (the hypothesis twin of the fixed-seed agreement test)."""
    from ocr_ray.kernels import sketches

    M = (1 << 61) - 1
    maxh = (1 << 32) - 1
    params = sketches._minhash_params(64, 1)
    hashes = [sketches._stable_hash64(s) % M for s in shingles]
    want = [min(((a * h + b) % M) & maxh for h in hashes) for a, b in params]
    assert sketches.minhash_signature(set(shingles)) == want


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=0, max_size=60
    )
)
@settings(max_examples=200, deadline=None)
def test_skyline_mask_matches_bruteforce(points):
    """_skyline_mask (sorted running-max, O(n log n)) must agree with the
    quadratic dominance definition the SQL twin runs, including duplicate
    points (which never dominate each other) and axis ties."""
    import numpy as np

    from ocr_ray.ops.documents import _skyline_mask

    x = np.array([p[0] for p in points], dtype=np.int64)
    y = np.array([p[1] for p in points], dtype=np.int64)
    got = _skyline_mask(x, y)
    for i in range(len(points)):
        dominated = any(
            x[j] >= x[i] and y[j] >= y[i] and (x[j] > x[i] or y[j] > y[i])
            for j in range(len(points))
        )
        assert got[i] == (not dominated), (i, points)


# ------------------------------------------------------------------ CDC

_ascii_text = st.text(alphabet=string.printable[:95], min_size=0, max_size=400)


@given(_ascii_text)
@settings(max_examples=120, deadline=None)
def test_cdc_ends_partition_text(text):
    """Chunk ends are strictly increasing and partition the byte range."""
    from ocr_ray.ops.documents import cdc_chunk_ends

    ends = list(cdc_chunk_ends(text))
    n = len(text.encode("utf-8"))
    if n == 0:
        assert ends == []
        return
    assert ends[-1] == n
    assert all(a < b for a, b in zip(ends, ends[1:]))


@given(_ascii_text, st.integers(0, 400), st.sampled_from("xyz@ "))
@settings(max_examples=120, deadline=None)
def test_cdc_edit_locality(text, pos, ch):
    """THE content-defined property: inserting one char at `pos` leaves
    every chunk boundary more than one window before the edit untouched
    (fixed-size blocking would shift every later boundary instead)."""
    from ocr_ray.ops.documents import CDC_WINDOW, cdc_chunk_ends

    pos = min(pos, len(text))
    edited = text[:pos] + ch + text[pos:]
    before = {e for e in cdc_chunk_ends(text) if e <= pos - CDC_WINDOW}
    after = {e for e in cdc_chunk_ends(edited) if e <= pos - CDC_WINDOW}
    assert before == after
