"""Property-based tests (hypothesis) for invariants the distributed
pipeline depends on."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.doclogic import run_document, toc
from pdf_parser_ray.doclogic.render import boilerplate_lines, strip_lines

printable_line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), max_size=60
)

span_strategy = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(
            ["text", "heading", "toc_line", "table", "image", "annotation",
             "layout_text", "page_break", "unknown_kind"]
        ),
        "text": printable_line,
        "media_ref": st.text(max_size=12),
    }
)


@st.composite
def documents(draw):
    spans = draw(st.lists(span_strategy, max_size=40))
    for i, s in enumerate(spans):
        s["offset"] = i
        if s["kind"] == "page_break":
            s["text"] = str(draw(st.integers(1, 200)))
    return spans


@given(documents(), st.randoms(use_true_random=False))
@settings(max_examples=60, deadline=None)
def test_span_order_invariance(spans, rnd):
    """Input span ORDER carries no information beyond `offset`: any
    permutation of the span list yields the identical document result —
    the property that makes chunked/parallel rendering safe."""
    base = run_document("d", spans)
    shuffled = list(spans)
    rnd.shuffle(shuffled)
    again = run_document("d", shuffled)
    assert base["spans"] == again["spans"]
    assert base["toc"] == again["toc"]
    assert base["sections"] == again["sections"]
    assert base["metadata"] == again["metadata"]


@given(documents())
@settings(max_examples=60, deadline=None)
def test_output_span_offsets_dense(spans):
    out = run_document("d", spans)["spans"]
    assert [s["offset"] for s in out] == list(range(len(out)))
    assert all(
        s["kind"] in {"text", "table", "image", "annotation", "layout_text"}
        for s in out
    )


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_clean_title_bounds(title):
    cleaned = toc.clean_title(title)
    assert len(cleaned) <= 120
    assert "...." not in cleaned
    assert not cleaned.endswith((".", " "))
    assert "  " not in cleaned


@given(
    st.lists(
        st.fixed_dictionaries(
            {"page": st.integers(-5, 12000), "title": st.text(max_size=60)}
        ),
        max_size=30,
    )
)
@settings(max_examples=60, deadline=None)
def test_dedup_and_validate_properties(entries):
    out = toc.dedup_and_validate(list(entries))
    keys = [(e["page"], (e["title"] or "").lower().strip()[:50]) for e in out]
    assert len(keys) == len(set(keys))  # no duplicate keys survive
    assert all(1 <= e["page"] <= 9999 for e in out)
    # every surviving entry is one of the inputs
    for e in out:
        assert e in entries


@given(st.lists(st.lists(printable_line, max_size=10), max_size=8))
@settings(max_examples=60, deadline=None)
def test_boilerplate_only_removes_repeated(pages_lines):
    texts = ["\n".join(lines) for lines in pages_lines]
    boiler = boilerplate_lines(texts)
    threshold = max(3, len(texts) // 2 + 1)
    for line in boiler:
        appears = sum(
            1 for t in texts if line in {x.strip() for x in t.splitlines()}
        )
        assert appears >= threshold and len(line) >= 4
    for t in texts:
        assert strip_lines(t, set()) == t


def test_media_decoder_never_crashes_on_fuzz():
    """Any byte payload either decodes, degrades, or raises
    NotImplementedError (codec formats) — never an unhandled error."""
    import numpy as np

    from pdf_parser_ray.ops.multimodal import MediaDecoder

    dec = MediaDecoder(fake=False)
    rng = np.random.RandomState(3)
    payloads = [bytes(rng.randint(0, 256, size=n, dtype=np.uint8)) for n in (0, 1, 2, 3, 13, 64, 300)]
    payloads += [b"P6" + bytes(rng.randint(0, 256, size=40, dtype=np.uint8)) for _ in range(20)]
    payloads += [b"BM" + bytes(rng.randint(0, 256, size=60, dtype=np.uint8)) for _ in range(20)]
    payloads += [b"P5\n#", b"P6\n999999999 999999999\n255\n", b"P6\n0 0\n255\n"]
    payloads += [
        b"\x89PNG\r\n\x1a\n" + bytes(rng.randint(0, 256, size=n, dtype=np.uint8))
        for n in (0, 4, 25, 80, 200)
    ]
    for p in payloads:
        try:
            out = dec._decode("f", p)
            assert set(out) == {"width", "height", "feature", "decode_ok"}
        except NotImplementedError:
            pass
