"""Exhaustive per-rule tests for the caption-chain merge (M3) break
conditions and the remaining M2/M4 rejection rules (SURVEY §5: 'M1-M6
merge passes against constructed box sets, including M2's three
rejection rules and each of M3's break rules')."""

import numpy as np

from ocr_pipeline_fastapi_latency_optimization_spark.functions import merges as M


def _page(boxes, classes, texts=None):
    boxes = np.array(boxes, dtype=np.int64)
    return M.PageBlocks(
        boxes=boxes,
        conf=np.ones(len(classes)),
        classes=list(classes),
        texts=list(texts or [str(i) for i in range(len(classes))]),
    )


def _fig_with_chain(cands):
    """Figure at y 100-300 (x 100-500) + text candidates below. All
    candidates overlap the figure's y-extent enough to be 'aligned'
    (tops inside [100, 300) keep vertical IoU > 0 with the figure)."""
    boxes = [[100, 100, 500, 300]] + cands
    classes = ["figure"] + ["text"] * len(cands)
    return _page(boxes, classes)


def test_m3_merges_full_chain():
    # two stacked candidates, both contained in base x-range, tight gaps
    pg = _fig_with_chain(
        [[120, 290, 480, 310], [120, 295, 480, 330]]
    )
    out = M.merge_text_figure_table(pg)
    assert out.classes == ["figure"]


def test_m3_break_gap_too_large():
    # second candidate far below the first (gap > 2x heights)
    pg = _fig_with_chain(
        [[120, 290, 480, 299], [120, 295, 480, 296]]
    )
    # craft: chain sorted by y0 -> [cand1(290), cand2(295)]; gap
    # = b[nxt].y0 - b[curr].y1 = 295-299 < 0 -> no break; rebuild:
    pg = _page(
        [[100, 100, 500, 300], [120, 290, 480, 296], [120, 299, 480, 300]],
        ["figure", "text", "text"],
    )
    # gap = 299-296 = 3; heights: 6 and 1 -> 2*1 < 3 breaks on the second
    out = M.merge_text_figure_table(pg)
    assert out.classes.count("text") == 1  # chain stopped after first


def test_m3_break_width_ratio():
    # second candidate much narrower than base: widths[i]/widths[curr] > 4
    pg = _page(
        [[100, 100, 500, 300], [120, 290, 190, 310], [120, 305, 480, 320]],
        ["figure", "text", "text"],
    )
    # curr width 70, base width 400 -> ratio > 4 -> break before second
    out = M.merge_text_figure_table(pg)
    assert out.classes.count("text") == 1


def test_m3_break_inclusion_transition():
    # first candidate contained in base x-range, second not -> break
    pg = _page(
        [[100, 100, 500, 300], [120, 290, 480, 310], [90, 305, 520, 320]],
        ["figure", "text", "text"],
    )
    out = M.merge_text_figure_table(pg)
    assert out.classes.count("text") == 1


def test_m3_break_right_edge_left_of_center():
    # second candidate ends left of first candidate's center -> break
    pg = _page(
        [[100, 100, 500, 300], [120, 290, 480, 310], [120, 305, 250, 320]],
        ["figure", "text", "text"],
    )
    out = M.merge_text_figure_table(pg)
    assert out.classes.count("text") == 1


def test_m3_break_left_shift_vs_base():
    # second candidate left-shifted relative to the base -> break
    pg = _page(
        [[100, 100, 500, 300], [120, 290, 480, 310], [80, 305, 460, 320]],
        ["figure", "text", "text"],
    )
    out = M.merge_text_figure_table(pg)
    assert out.classes.count("text") == 1


def test_m2_table_gap_rule():
    # single candidate below a TABLE with dist_y > candidate height -> no merge
    pg = _page(
        [[100, 100, 500, 300], [120, 295, 480, 480]],
        ["table", "text"],
    )
    # dist_y = 295-300 = -5 <= h -> merges; rebuild with a true gap:
    pg = _page(
        [[100, 100, 500, 300], [120, 299, 480, 305]],
        ["table", "text"],
    )
    # aligned (y0 299 < 300), close (305-300=5 <= 200), dist_y=-1 <= h=6 -> merge
    out = M.merge_text_figure_table(pg)
    assert out.classes == ["table"]


def test_m2_figure_inclusion_overrides_right_edge():
    # candidate ends left of center BUT is ≥50% inside the figure -> merge
    pg = _page(
        [[100, 100, 500, 300], [120, 260, 250, 299]],
        ["figure", "text"],
    )
    out = M.merge_text_figure_table(pg)
    assert out.classes == ["figure"]


def test_m2_figure_right_edge_rule():
    # candidate right edge < figure center and inclusion < 0.5 -> no merge
    pg = _page(
        [[100, 100, 500, 300], [120, 295, 250, 330]],
        ["figure", "text"],
    )
    out = M.merge_text_figure_table(pg)
    assert len(out) == 2


def test_m4_title_not_contained_is_rejected():
    # text above table but sticking out horizontally -> not merged
    pg = _page(
        [[100, 200, 500, 400], [50, 160, 450, 210]],
        ["table", "text"],
    )
    out = M.merge_text_figure_table(pg)
    assert len(out) == 2


def test_m4_title_gap_rule():
    # contained but too far above (dist_y > candidate height) -> rejected
    pg = _page(
        [[100, 200, 500, 400], [150, 100, 450, 140]],
        ["table", "text"],
    )
    out = M.merge_text_figure_table(pg)
    assert len(out) == 2


def test_nontext_blocker_limits_caption_search():
    # a figure below the base figure blocks text candidates beyond it
    pg = _page(
        [
            [100, 100, 500, 300],  # base figure
            [100, 295, 500, 400],  # another figure (non-text blocker)
            [120, 395, 480, 430],  # text below the blocker
        ],
        ["figure", "figure", "text"],
    )
    out = M.merge_text_figure_table(pg)
    # the text merges into the *second* figure (its own caption pass),
    # never into the first (blocked)
    assert out.boxes[0].tolist() == [100, 100, 500, 300]
