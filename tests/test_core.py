"""Unit tests for the pure extraction core (no Spark) — the per-operator
tests of SURVEY §5: geometry kernels against hand-computed matrices, merge
passes against constructed box sets, stamp/enrich round trips, tolerant
sentinel parsing."""

import json

import numpy as np
import pytest

from ocr_pipeline_fastapi_latency_optimization_spark.functions import geometry as G
from ocr_pipeline_fastapi_latency_optimization_spark.functions import merges as M
from ocr_pipeline_fastapi_latency_optimization_spark.functions.extract import (
    enrich_skeleton,
    extract_turn,
    extract_turn_full,
    sentinel,
    serialize_block,
    strip_code_fences,
)
from ocr_pipeline_fastapi_latency_optimization_spark.functions.tokenize import (
    classify_payload,
    merge_adjacent_text_blocks,
    score_blocks,
    tokenize_html,
    tokenize_plain,
)


# --- geometry (G1-G7) -------------------------------------------------------


def test_box_areas():
    b = np.array([[0, 0, 2, 3], [1, 1, 4, 2]])
    assert G.box_areas(b).tolist() == [6.0, 3.0]


def test_pairwise_inclusion_convention():
    # small box fully inside big box
    b = np.array([[0, 0, 10, 10], [2, 2, 4, 4]])
    incl = G.pairwise_inclusion(b, zero_diag=True)
    # incl[i, j] = inter / area_j: row 0 says "all of box 1 is inside box 0"
    assert incl[0, 1] == pytest.approx(1.0)
    assert incl[1, 0] == pytest.approx(4.0 / 100.0)
    assert incl[0, 0] == 0.0


def test_pairwise_iou():
    b = np.array([[0, 0, 2, 2], [1, 0, 3, 2]])
    iou = G.pairwise_iou(b)
    assert iou[0, 1] == pytest.approx(2.0 / 6.0)
    assert iou[0, 0] == pytest.approx(1.0)


def test_vertical_iou_ignores_x():
    b = np.array([[0, 0, 5, 10], [100, 5, 200, 15]])  # x-disjoint, y-overlap
    vy = G.vertical_iou(b)
    assert vy[0, 1] == pytest.approx(5.0 / 15.0)


def test_union_box():
    b = np.array([[0, 5, 2, 9], [1, 1, 4, 2]])
    assert G.union_box(b).tolist() == [0, 1, 4, 9]


# --- preprocessing (P1/P2/P4/O1) --------------------------------------------


def test_preprocess_conf_filter_sort_pad_clamp():
    raw = [
        {"bbox": [10, 10, 20, 20], "label": "text", "conf": 0.2},  # filtered
        {"bbox": [0, 0, 100, 100], "label": "table", "conf": 0.5},  # padded+clamped
        {"bbox": [5, 5, 9, 9], "label": "doc_title", "conf": 0.9},  # -> text
        {"bbox": [1, 1, 2, 2], "label": "footer", "conf": 0.9},  # -> abandon, tie
    ]
    pb = M.preprocess_page(raw, width=1000, height=500)
    # conf sort desc, stable tie (doc_title before footer: input order)
    assert pb.classes == ["text", "abandon", "table"]
    pad = int(500 * 0.005)  # 2
    assert pb.boxes[2].tolist() == [0, 0, 100 + pad, 100 + pad]
    assert len(pb) == 3


def test_label_map_covers_20_labels():
    assert len(M.MAP_LABELS) == 20
    assert set(M.MAP_LABELS.values()) == {"text", "figure", "formula", "table", "abandon"}
    assert M.CLASSES == ["abandon", "figure", "formula", "table", "text"]


# --- fixed-point merge (M1) ---------------------------------------------------


def _page(boxes, classes, texts=None):
    boxes = np.array(boxes, dtype=np.int64)
    return M.PageBlocks(
        boxes=boxes,
        conf=np.ones(len(classes)),
        classes=list(classes),
        texts=list(texts or [""] * len(classes)),
    )


def test_merge_same_class_overlap():
    # two heavily overlapping text boxes -> pass (d) unions them
    pg = _page([[0, 0, 10, 10], [1, 1, 9, 9]], ["text", "text"], ["a", "b"])
    out = M.merge_object_pair(pg, ["text"], tlabel=None, threshold=0.0)
    assert len(out) == 1
    assert out.boxes[0].tolist() == [0, 0, 10, 10]
    assert out.texts[0] == "a\nb"


def test_merge_threshold_blocks_small_overlap():
    # tiny corner overlap below threshold -> no merge
    pg = _page([[0, 0, 10, 10], [9, 9, 20, 20]], ["text", "abandon"])
    out = M.merge_object_pair(pg, "text", tlabel="abandon", threshold=0.5)
    assert len(out) == 2


def test_merge_fixed_point_chains():
    # a ⊃ b, b ⊃ c but c not inside a enough until b merges -> needs 2 sweeps
    pg = _page(
        [[0, 0, 100, 100], [40, 40, 140, 140], [120, 120, 150, 150]],
        ["text", "text", "text"],
    )
    out = M.merge_object_pair(pg, ["text"], tlabel=None, threshold=0.3)
    assert len(out) == 1
    assert out.boxes[0].tolist() == [0, 0, 150, 150]


def test_run_duplicate_filter_abandon_absorption():
    # pass (c): a text box mostly inside an abandon box is absorbed into it
    pg = _page([[0, 0, 100, 100], [10, 10, 30, 30]], ["abandon", "text"])
    out = M.run_duplicate_filter(pg)
    assert out.classes == ["abandon"]


def test_formula_internal_merge_aspect_rule():
    # text box inside formula vertical range with aspect < 2 merges (M5);
    # wide strip (aspect >= 2) does not
    pg = _page(
        [[0, 100, 200, 200], [10, 110, 40, 140], [10, 150, 190, 160]],
        ["formula", "text", "text"],
    )
    out = M.merge_formula_text(pg)
    assert out.classes == ["formula", "text"]
    assert len(out) == 2


def test_formula_below_pass_is_noop():
    # the literal blocker semantics make strategy 2 unreachable (quirk parity)
    pg = _page(
        [[0, 0, 100, 50], [0, 60, 100, 80]],
        ["formula", "text"],
    )
    out = M.merge_formula_text(pg)
    assert len(out) == 2  # no merge: the candidate is its own blocker


def test_caption_below_figure_merges():
    # caption text just below a figure, y-overlapping via padding
    pg = _page(
        [[100, 100, 500, 300], [120, 295, 480, 330]],
        ["figure", "text"],
        ["", "Figure 1: caption"],
    )
    out = M.merge_text_figure_table(pg)
    assert out.classes == ["figure"]
    assert out.texts[0] == "Figure 1: caption"
    assert out.boxes[0].tolist() == [100, 100, 500, 330]


def test_caption_left_shift_rejected():
    pg = _page(
        [[100, 100, 500, 300], [50, 295, 480, 330]],  # cand.x0 < base.x0, x1 < base.x1
        ["table", "text"],
    )
    out = M.merge_text_figure_table(pg)
    assert len(out) == 2


def test_title_above_table_merges():
    pg = _page(
        [[100, 200, 500, 400], [150, 160, 450, 195]],  # contained, gap 5 <= h 35
        ["table", "text"],
        ["", "Table 1: title"],
    )
    # overlap in y needed for vertical_iou > 0: grow title to touch table
    pg.boxes[1] = np.array([150, 160, 450, 210])
    out = M.merge_text_figure_table(pg)
    assert out.classes == ["table"]
    assert out.texts[0] == "Table 1: title"


# --- XY-cut -------------------------------------------------------------------


def test_xy_cut_two_columns():
    boxes = np.array(
        [
            [0, 0, 100, 10],  # full-width title
            [0, 20, 45, 60],  # left col top
            [55, 20, 100, 60],  # right col top
            [0, 65, 45, 90],  # left col bottom
            [55, 65, 100, 90],  # right col bottom
        ]
    )
    order = M.xy_cut_order(boxes)
    assert order == [0, 1, 3, 2, 4]  # title, left column, right column


def test_xy_cut_deterministic_overlap_fallback():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [5, 0, 15, 10]])
    assert M.xy_cut_order(boxes) == [0, 1, 2]


# --- tokenizers ---------------------------------------------------------------


def test_classify_payload():
    assert classify_payload("hello world") == "plain"
    assert classify_payload("<p>hi</p>") == "html"
    assert classify_payload(json.dumps({"pages": []})) == "pdf"
    assert classify_payload('```json\n{"pages": []}\n```') == "pdf"
    assert classify_payload('{"pages": "not-a-list"}') == "plain"
    assert classify_payload(None) == "plain"
    assert classify_payload("a < b and c > d") == "plain"


def test_tokenize_plain_offsets_and_tabs():
    text = "  first\tline\n\n\n***\n\nlast"
    blocks = tokenize_plain(text)
    assert [b.text for b in blocks] == ["  first    line", "***", "last"]
    assert [b.kept for b in blocks] == [True, False, True]
    assert text[blocks[0].start : blocks[0].end] == "first\tline"
    assert text[blocks[2].start : blocks[2].end] == "last"


def test_tokenize_html_containers_and_table_grid():
    html = (
        "<nav><a href='/'>home</a></nav>"
        "<p>Real content paragraph here.</p>"
        "<table><tr><th>h1</th><th>h2</th></tr><tr><td>1</td><td>2</td></tr></table>"
        "<figure><figcaption>cap text</figcaption></figure>"
    )
    blocks = tokenize_html(html)
    labels = [b.label for b in blocks]
    assert labels == ["abandon", "text", "table", "figure"]
    assert blocks[2].rows == [["h1", "h2"], ["1", "2"]]
    assert blocks[3].text == "cap text"


def test_adjacent_fragment_merge_and_link_density():
    html = "<p>one two three</p><p>four five six</p><div><a href='x'>all link text here</a></div>"
    blocks = merge_adjacent_text_blocks(tokenize_html(html), html)
    assert len(blocks) == 2
    assert blocks[0].text == "one two three four five six"
    scored = score_blocks(blocks)
    assert scored[0].kept is True
    assert scored[1].kept is False  # pure link block


def test_no_merge_across_non_text_block():
    html = (
        "<p>first para words</p><table><tr><td>x</td></tr></table>"
        "<p>second para words</p>"
    )
    blocks = merge_adjacent_text_blocks(tokenize_html(html), html)
    assert [b.label for b in blocks] == ["text", "table", "text"]


def test_comments_doctype_invisible():
    html = (
        "<!DOCTYPE html><!-- header comment with words -->"
        "<p>real content paragraph here</p>"
        "<!-- gap comment > with a bracket --><p>second real paragraph text</p>"
        "<?xml-stylesheet foo?>"
    )
    blocks = merge_adjacent_text_blocks(tokenize_html(html), html)
    # comments never appear as text, and comment-only gaps still merge
    assert len(blocks) == 1
    assert "comment" not in blocks[0].text
    assert blocks[0].text == (
        "real content paragraph here second real paragraph text"
    )


def test_script_style_dropped():
    html = (
        "<p>keep this visible sentence</p>"
        "<script>var x = 'drop me';</script>"
        "<style>.a { color: red }</style>"
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.functions.extract import (
        extract_turn_full,
    )

    r = extract_turn_full(html, 0)
    assert r["extracted_text"] == "keep this visible sentence"


def test_stray_text_between_paragraphs_folds_in():
    # visible text between </p> and <p> is itself a block; markup-only
    # gaps on both sides -> all three fold into one content block
    html = "<p>first para words</p>plain gap text<p>second para words</p>"
    blocks = merge_adjacent_text_blocks(tokenize_html(html), html)
    assert len(blocks) == 1
    assert blocks[0].text == "first para words plain gap text second para words"


# --- mask / stamp / enrich -----------------------------------------------------


def test_sentinel_roundtrip_and_counters():
    html = (
        "<p>Intro paragraph with words.</p>"
        "<table><tr><td>a</td></tr></table>"
        "<table><tr><td>b</td></tr></table>"
        "<figure><figcaption>F0</figcaption></figure>"
    )
    r = extract_turn(html, 5)
    assert sentinel(5, "table", 0) in r["skeleton"]
    assert sentinel(5, "table", 1) in r["skeleton"]
    assert sentinel(5, "figure", 0) in r["skeleton"]
    keys = [(k, i) for k, i, _ in r["preserved"]]
    assert keys == [("table", 0), ("table", 1), ("figure", 0)]


def test_enrich_tolerant_regex_and_missing():
    reps = {"table_0": "T0"}
    assert enrich_skeleton("x [[TURN 3 table_0]] y", reps) == "x T0 y"
    # mangled separators still parse
    assert enrich_skeleton("[[ turn_3  TABLE \\_0 .. ]]", reps) == "T0"
    # missing index -> missing message for bare kind
    assert enrich_skeleton("[[TURN 3 figure]]", reps) == "[missing figure]"
    # unmatched index -> missing message
    assert enrich_skeleton("[[TURN 3 table_7]]", reps) == "[missing table_7]"
    # non-sentinel text untouched
    assert enrich_skeleton("PAGE 3 table\\_0: HERE", reps) == "PAGE 3 table\\_0: HERE"


def test_serialize_table_and_figure():
    t = serialize_block(json.dumps({"type": "table_rows", "rows": [["a", "b"], ["1"]]}))
    assert t == "| a | b |\n| --- | --- |\n| 1 |  |"
    assert serialize_block(json.dumps({"type": "caption", "text": " c  d "})) == "![figure] c d"
    assert serialize_block(json.dumps({"type": "raw", "text": "x\n y"})) == "x y"
    assert serialize_block("not json") == "not json"


def test_strip_code_fences():
    assert strip_code_fences("a```b```c") == "abc"


def test_sentinel_injection_is_deterministic():
    """A payload that already contains our sentinel grammar resolves
    against the SAME turn's preserved blocks (or the missing-crop
    message) — never another turn's, never nondeterministically. This is
    the JN1 semantics under adversarial input: attempted resolution,
    left-join survival (MarkdownEnricher.py:69-94)."""
    html = (
        "<p>user pasted [[TURN 9 table_0]] into their message</p>"
        "<table><tr><td>42</td></tr></table>"
    )
    r = extract_turn_full(html, 3)
    # the injected tag resolves to THIS turn's table_0 serialization
    # (key is (kind, k); the turn number in the tag is display-only)
    assert r["extracted_text"].count("| 42 |") == 2
    # and with no table present, the injected tag becomes missing-crop
    r2 = extract_turn_full("<p>xx [[TURN 9 table_0]] yy</p>", 3)
    assert "[missing table_0]" in r2["extracted_text"]


def test_extract_full_plain_metrics():
    r = extract_turn_full("hello world\n\n***", 0)
    assert r["extracted_text"] == "hello world"
    assert r["n_blocks_kept"] == 1
    assert r["n_blocks_dropped"] == 1
    assert r["chars_extracted"] == len("hello world")


def test_extract_never_raises_on_garbage():
    for bad in ['{"pages": [{"blocks": "zzz"}]}', "<p", "\x00\x01", ""]:
        r = extract_turn_full(bad, 0)
        assert isinstance(r["extracted_text"], str)


def test_giant_table_and_nested_lists():
    rows = "".join(
        f"<tr><td>r{i}</td><td>{i * 7}</td></tr>" for i in range(1000)
    )
    html = (
        "<ul><li>item one text</li><li>item two text"
        "<ul><li>nested item text</li></ul></li></ul>"
        f"<table><tr><th>k</th><th>v</th></tr>{rows}</table>"
    )
    r = extract_turn_full(html, 0)
    assert "| r999 | 6993 |" in r["extracted_text"]
    assert "nested item text" in r["extracted_text"]


def test_unclosed_table_still_flushes():
    html = "<p>before the table text</p><table><tr><td>cell x</td></tr>"
    r = extract_turn_full(html, 0)
    assert "before the table text" in r["extracted_text"]
    assert "| cell x |" in r["extracted_text"]


def test_figure_nested_inside_table_is_table_content():
    # capture containers don't nest: inner <figure> text stays in the table
    html = "<table><tr><td><figure><figcaption>fc</figcaption></figure>v1</td></tr></table>"
    r = extract_turn_full(html, 0)
    assert r["n_blocks_kept"] == 1
    assert "fc" in r["extracted_text"]


def test_extract_pdf_conf_ties_stable():
    # two blocks with identical confidence keep input order (INV-1)
    payload = json.dumps(
        {
            "pages": [
                {
                    "w": 1000,
                    "h": 1000,
                    "blocks": [
                        {"bbox": [0, 0, 900, 100], "label": "text", "conf": 0.5, "text": "first"},
                        {"bbox": [0, 200, 900, 300], "label": "text", "conf": 0.5, "text": "second"},
                    ],
                }
            ]
        }
    )
    r = extract_turn_full(payload, 0)
    assert r["extracted_text"] == "first\n\nsecond"


def test_classify_oracle_parity_on_adversarial_payloads(tmp_path):
    """ADVICE round-1: the classify_payloads oracle SQL must agree with
    classify_payload() on the edge inputs where the old SQL diverged —
    leading whitespace before '{', a fence past the 4000-char gate,
    malformed layout JSON containing '"pages"', and pages-not-a-list."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from ocr_pipeline_fastapi_latency_optimization_spark.functions.tokenize import (
        classify_payload,
    )

    payloads = [
        '   {"pages": []}',                      # leading ws before '{'
        "x" * 4500 + ' ```json {"pages": []} ```',  # fence beyond gate
        '{"pages": oops}',                        # malformed but has key
        '{"pages": {"a": 1}}',                    # pages not a list
        '```json {"pages": [{"w":1,"h":1,"blocks":[]}]} ```',  # good fence
        "<p>hello</p>",
        "just words",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(payloads)),
            "text": payloads,
            "lang": ["en"] * len(payloads),
            "source": ["t"] * len(payloads),
            "n_chars": [len(p) for p in payloads],
        }
    )
    path = tmp_path / "documents.parquet"
    pdf.to_parquet(path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    got_sql = dict(
        con.execute(entrymod.oracle_sql()["classify_payloads"]).fetchall()
    )
    want = {i: classify_payload(p) for i, p in enumerate(payloads)}
    assert want[0] == "pdf" and want[1] == "plain" and want[2] == "plain"
    assert want[3] == "plain" and want[4] == "pdf" and want[5] == "html"
    assert got_sql == want


def test_arabic_shaping_contextual_forms():
    """F9 (FileIngestor.py:208-221 analog): UCD-derived contextual
    shaping — initial/medial/final/isolated selection, lam-alef
    ligatures, joining classes, harakat transparency."""
    import unicodedata

    from ocr_pipeline_fastapi_latency_optimization_spark.functions import arabic

    def names(s):
        return [unicodedata.name(c) for c in s if ord(c) > 0xFB00]

    # kaf-teh-alef-beh: dual-joiners chain; alef breaks the forward join
    assert names(arabic.reshape_arabic("كتاب")) == [
        "ARABIC LETTER KAF INITIAL FORM",
        "ARABIC LETTER TEH MEDIAL FORM",
        "ARABIC LETTER ALEF FINAL FORM",
        "ARABIC LETTER BEH ISOLATED FORM",
    ]
    # lam + alef fuse; after a connecting seen the ligature takes FINAL
    assert names(arabic.reshape_arabic("سلا")) == [
        "ARABIC LETTER SEEN INITIAL FORM",
        "ARABIC LIGATURE LAM WITH ALEF FINAL FORM",
    ]
    assert names(arabic.reshape_arabic("لا")) == [
        "ARABIC LIGATURE LAM WITH ALEF ISOLATED FORM"
    ]
    # non-Arabic text is untouched end-to-end
    assert arabic.arabic_display("plain ascii 123") == "plain ascii 123"


def test_arabic_bidi_reverses_runs_only():
    from ocr_pipeline_fastapi_latency_optimization_spark.functions import arabic

    out = arabic.arabic_display("hello مرحبا world")
    # LTR context preserved, Arabic run reversed in place
    assert out.startswith("hello ") and out.endswith(" world")
    shaped = arabic.reshape_arabic("مرحبا")
    assert shaped[::-1] in out


def test_arabic_udf_matches_pure_function(spark):
    import pandas as pd

    from ocr_pipeline_fastapi_latency_optimization_spark.functions import arabic

    texts = ["كتاب", "السلام عليكم", "hello مرحبا world", "", "no arabic"]
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    got = (
        df.select(arabic.arabic_display_udf()(df["t"]).alias("d"))
        .toPandas()["d"]
        .tolist()
    )
    assert got == [arabic.arabic_display(t) for t in texts]
