"""Block-merge heuristics over layout boxes (the algorithmic core).

Re-expresses, as pure numpy functions over ``(boxes, classes, texts)``
triples, the behavior of the reference's detection-merging passes:

* label consolidation (20 raw detector labels → 5 classes, ``DLA.py:59-90``)
* confidence sort + box padding/clamp (``DLA.py:515-534`` equivalent,
  seen in ``_convert_pp_to_sv`` ``DLA.py:508-541``)
* the generic fixed-point inclusion merge (``DLA.py:193-251``) and its
  four configured passes (``DLA.py:152-171``)
* caption / title merges below figures & above tables (``DLA.py:272-416``)
* formula-text merges (``DLA.py:433-470``)
* recursive XY-cut reading order (our addition — the reference relies on
  the VLM to linearize; we must do it deterministically).

These run *inside* the per-turn Arrow UDF; a "page" here is one page of a
pdf-layout payload embedded in a transcript turn.

Determinism invariants (SURVEY.md §2.13): stable confidence-desc sort
(INV-1); per-sweep matrix computed once, rows/cols of merged boxes zeroed
in index order (INV-2); merged-candidate text appended in ascending index
order so the oracle and Spark produce identical strings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

from .geometry import pairwise_inclusion, union_box, vertical_iou

# 20 raw detector labels → 5 internal classes (behavioral parity with the
# reference's label taxonomy, DLA.py:59-80). Unknown labels map to 'text'.
MAP_LABELS = {
    "paragraph_title": "text",
    "image": "figure",
    "text": "text",
    "number": "text",
    "abstract": "text",
    "content": "text",
    "figure_title": "text",
    "formula": "formula",
    "table": "table",
    "reference": "text",
    "doc_title": "text",
    "footnote": "text",
    "header": "text",
    "algorithm": "figure",
    "footer": "abandon",
    "seal": "figure",
    "chart": "figure",
    "formula_number": "text",
    "aside_text": "abandon",
    "reference_content": "text",
}

CLASSES = sorted(set(MAP_LABELS.values()))  # abandon figure formula table text
DEFAULT_CONF = 0.38  # detector threshold, DLA.py:137
DEFAULT_IOU = 0.5  # merge threshold, DLA.py:137
PAD_FRACTION = 0.005  # visual-box padding, DLA.py:526


@dataclass
class PageBlocks:
    """Parallel arrays of one page's layout blocks (the Detections analog,
    DLA.py:536-541): int boxes, confidences, consolidated class names, and
    the block text payloads."""

    boxes: np.ndarray  # (N, 4) int64
    conf: np.ndarray  # (N,) float64
    classes: List[str]
    texts: List[str]

    def __len__(self) -> int:
        return len(self.classes)

    def take(self, mask: np.ndarray) -> "PageBlocks":
        idx = np.nonzero(np.asarray(mask))[0]
        return PageBlocks(
            boxes=self.boxes[idx].copy(),
            conf=self.conf[idx].copy(),
            classes=[self.classes[i] for i in idx],
            texts=[self.texts[i] for i in idx],
        )


def preprocess_page(
    raw_blocks: Sequence[dict],
    width: float,
    height: float,
    conf_threshold: float = DEFAULT_CONF,
) -> PageBlocks:
    """Confidence filter (P4) → stable conf-desc sort (O1/INV-1) → label
    consolidation (P1) → int cast → pad+clamp visual boxes (P2).

    Mirrors the preprocessing order of the reference's detection
    conversion (``DLA.py:508-541``): sort first, then pad
    table/formula/figure boxes by ``0.005·min(H, W)`` and clamp to the
    page bounds, truncating to int.
    """
    kept = [
        b
        for b in raw_blocks
        if float(b.get("conf", 1.0)) >= conf_threshold and "bbox" in b
    ]
    # Stable sort by confidence descending (Python sort is stable; ties
    # keep input order — INV-1).
    kept.sort(key=lambda b: -float(b.get("conf", 1.0)))
    n = len(kept)
    boxes = np.zeros((n, 4), dtype=np.int64)
    conf = np.zeros(n, dtype=np.float64)
    classes: List[str] = []
    texts: List[str] = []
    pad = min(float(width), float(height)) * PAD_FRACTION
    for i, b in enumerate(kept):
        x0, y0, x1, y1 = (float(v) for v in b["bbox"])
        cls = MAP_LABELS.get(str(b.get("label", "text")), "text")
        if cls in ("table", "formula", "figure"):
            x0, y0 = max(0.0, x0 - pad), max(0.0, y0 - pad)
            x1, y1 = min(float(width), x1 + pad), min(float(height), y1 + pad)
        boxes[i] = (int(x0), int(y0), int(x1), int(y1))
        conf[i] = float(b.get("conf", 1.0))
        classes.append(cls)
        texts.append(str(b.get("text", "")))
    return PageBlocks(boxes=boxes, conf=conf, classes=classes, texts=texts)


def _merge_text_into(texts: List[str], base: int, merged: Sequence[int]) -> None:
    parts = [texts[base]] + [texts[j] for j in merged if texts[j]]
    texts[base] = "\n".join(p for p in parts if p != "") if any(parts) else texts[base]


def merge_object_pair(
    page: PageBlocks,
    rlabel,
    tlabel=None,
    threshold: float = 0.0,
) -> PageBlocks:
    """Generic fixed-point inclusion merge (``DLA.py:193-251``).

    Sweep until no change: compute the inclusion matrix once per sweep
    (diagonal zeroed); for each base box ``i`` of class ∈ ``rlabel`` in
    index order, candidates are boxes of class ∈ ``tlabel`` (or the same
    class when ``tlabel`` is None) whose inclusion score
    ``incl[i, j] = inter/area_j`` is ≥ threshold and > 0; union their
    boxes into ``i`` (A1), mark them removed, and zero their matrix
    rows/columns so they can't merge twice within the sweep (INV-2).
    Removed boxes are compacted *after* the sweep.
    """
    rset = frozenset([rlabel] if isinstance(rlabel, str) else rlabel)
    tset = (
        None
        if tlabel is None
        else frozenset([tlabel] if isinstance(tlabel, str) else tlabel)
    )
    page = PageBlocks(
        page.boxes.copy(), page.conf.copy(), list(page.classes), list(page.texts)
    )
    while True:
        n = len(page)
        if n <= 1:
            return page
        cls = page.classes
        # set membership beats np.isin at these tiny N
        is_base = np.fromiter((c in rset for c in cls), dtype=bool, count=n)
        if not is_base.any():
            return page
        # candidate mask is invariant across bases when tlabel is fixed;
        # no candidates at all ⇒ skip the O(N²) matrix entirely
        tmask = (
            None
            if tset is None
            else np.fromiter((c in tset for c in cls), dtype=bool, count=n)
        )
        if tmask is not None and not tmask.any():
            return page
        incl = pairwise_inclusion(page.boxes, zero_diag=True)
        keep = np.ones(n, dtype=bool)
        changed = False
        # same-class mode: one mask per distinct class per sweep, not one
        # per base (the per-base fromiter made this loop O(N²) in masks)
        class_masks = (
            {
                c: np.fromiter((x == c for x in cls), dtype=bool, count=n)
                for c in set(cls)
            }
            if tmask is None
            else None
        )
        for i in np.nonzero(is_base)[0]:
            cand = class_masks[cls[i]] if tmask is None else tmask
            scores = np.where(cand, incl[i], 0.0)
            merged = np.nonzero((scores >= threshold) & (scores > 0.0))[0]
            if merged.size:
                page.boxes[i] = union_box(page.boxes[[i, *merged]]).astype(np.int64)
                _merge_text_into(page.texts, i, merged.tolist())
                keep[merged] = False
                incl[merged, :] = 0.0
                incl[:, merged] = 0.0
                changed = True
        if not changed:
            return page  # keep is all-True here — skip the no-op copy
        page = page.take(keep)


def run_duplicate_filter(page: PageBlocks, iou: float = DEFAULT_IOU) -> PageBlocks:
    """The four configured merge passes, in production order
    (``DLA.py:152-171``), including the text←abandon quirk of pass (a)
    (``DLA.py:156-158``):

    a. bases ``text``, candidates ``abandon``          @ iou
    b. bases ``text|table|figure``, candidates ``formula`` @ iou
    c. bases ``abandon``, candidates all five classes  @ iou
    d. bases ``text|figure|table|formula``, same-class @ 0.0
    """
    page = merge_object_pair(page, "text", tlabel="abandon", threshold=iou)
    page = merge_object_pair(
        page, ["text", "table", "figure"], tlabel="formula", threshold=iou
    )
    page = merge_object_pair(
        page,
        "abandon",
        tlabel=["figure", "table", "formula", "text", "abandon"],
        threshold=iou,
    )
    page = merge_object_pair(page, ["text", "figure", "table", "formula"])
    return page


def merge_formula_text(page: PageBlocks) -> PageBlocks:
    """Formula-internal and formula-below text merges (``DLA.py:433-470``).

    Strategy 1: text blocks vertically contained in a formula box
    (``formula.y0 ≤ t.y0`` and ``formula.y1 ≥ t.y1``) with aspect ratio
    ``max(h,w)/min(h,w) < 2`` merge into the formula.

    Strategy 2 re-expresses the reference's below-formula scan literally
    — including its quirk that every text candidate is also a "blocker",
    so the strict ``y0 < min(blocker.y0)`` constraint can never admit a
    text candidate; the pass is effectively a no-op, preserved (and
    golden-tested) for behavioral parity.
    """
    page = PageBlocks(
        page.boxes.copy(), page.conf.copy(), list(page.classes), list(page.texts)
    )
    n = len(page)
    if n == 0:
        return page
    names = np.array(page.classes)
    is_text = names == "text"
    is_formula = names == "formula"
    keep = np.ones(n, dtype=bool)
    if not (is_formula.any() and is_text.any()):
        return page

    for i in range(n):
        if is_formula[i] and keep[i]:
            b = page.boxes.astype(np.float64)
            inside = (b[i, 3] >= b[:, 3]) & (b[i, 1] <= b[:, 1])
            h = b[:, 3] - b[:, 1]
            w = b[:, 2] - b[:, 0]
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = np.maximum(h, w) / np.minimum(h, w)
            ratio_ok = np.nan_to_num(ratio, nan=np.inf) < 2.0
            cand = keep & is_text & inside & ratio_ok
            if cand.any():
                idx = np.nonzero(cand)[0]
                page.boxes[i] = union_box(page.boxes[[i, *idx]]).astype(np.int64)
                _merge_text_into(page.texts, i, idx.tolist())
                keep[idx] = False

    for i in range(n):
        if is_formula[i] and keep[i]:
            b = page.boxes.astype(np.float64)
            vy = vertical_iou(b)
            below = b[:, 1] > b[i, 1]
            aligned = vy[i, :] > 0
            blockers = below & aligned & (~is_formula)
            if blockers.any():
                below = below & (b[:, 1] < b[blockers, 1].min())
            cand = keep & is_text & below & aligned
            if cand.any():  # unreachable in practice (see docstring)
                idx = np.nonzero(cand)[0]
                page.boxes[i] = union_box(page.boxes[[i, *idx]]).astype(np.int64)
                _merge_text_into(page.texts, i, idx.tolist())
                keep[idx] = False

    return page.take(keep)


def merge_text_figure_table(page: PageBlocks) -> PageBlocks:
    """Caption merge below figures/tables (single + chained candidates)
    and title merge above tables (``DLA.py:272-416``), with the same
    rejection rules: table-gap larger than candidate height, left-shifted
    candidates, figure candidates ending left of the base center with
    inclusion < 0.5, and the chain-break conditions (gap > 2·height,
    width ratio > 4, lost vertical alignment, inclusion-state transitions,
    left-shift, right-edge < center)."""
    page = PageBlocks(
        page.boxes.copy(), page.conf.copy(), list(page.classes), list(page.texts)
    )
    n = len(page)
    if n == 0:
        return page
    names = np.array(page.classes)
    is_text = names == "text"
    is_fig = names == "figure"
    is_table = names == "table"
    keep = np.ones(n, dtype=bool)
    if not (is_text.sum() * (is_fig.sum() + is_table.sum())):
        return page

    def _union(i: int, idx: List[int]) -> None:
        page.boxes[i] = union_box(page.boxes[[i, *idx]]).astype(np.int64)
        _merge_text_into(page.texts, i, idx)
        is_text[idx] = False
        keep[idx] = False

    # --- captions below figures/tables (DLA.py:272-381) ---
    for i in range(n):
        if not (keep[i] and (is_fig[i] or is_table[i])):
            continue
        b = page.boxes.astype(np.float64)
        below = b[:, 1] > b[i, 1]
        vy = vertical_iou(b)
        aligned = vy[i, :] > 0
        nontext_blockers = below & aligned & (~is_text)
        if nontext_blockers.any():
            below = below & (b[:, 1] < b[nontext_blockers, 1].min())
        heights = b[:, 3] - b[:, 1]
        widths = b[:, 2] - b[:, 0]
        dist_y = b[:, 1] - b[i, 3]
        close_enough = (b[:, 3] - b[i, 3]) <= heights[i]
        valid = is_text & below & aligned & close_enough
        nv = int(valid.sum())
        if nv == 1:
            idx = int(np.argmax(valid))
            ok = True
            if is_table[i] and dist_y[idx] > heights[idx]:
                ok = False
            if (b[idx, 0] < b[i, 0]) and (b[idx, 2] < b[i, 2]):
                ok = False
            if is_fig[i]:
                incl = pairwise_inclusion(b, zero_diag=True)
                center_x = (b[i, 2] + b[i, 0]) / 2.0
                if (b[idx, 2] < center_x) and (incl[i, idx] < 0.5):
                    ok = False
            if ok:
                _union(i, [idx])
        elif nv > 1:
            indices = np.nonzero(valid)[0]
            indices = indices[np.argsort(b[indices, 1], kind="stable")]
            main_included = (b[:, 0] >= b[i, 0]) & (b[:, 2] <= b[i, 2])
            chain = [int(indices[0])]
            for k in range(len(indices) - 1):
                curr, nxt = int(indices[k]), int(indices[k + 1])
                gap = b[nxt, 1] - b[curr, 3]
                if (2 * heights[curr] < gap) or (2 * heights[nxt] < gap):
                    break
                if widths[curr] > 0 and widths[i] / widths[curr] > 4:
                    break
                if not vy[curr, nxt]:
                    break
                if main_included[curr] and not main_included[nxt]:
                    break
                if (not main_included[curr]) and (not main_included[nxt]):
                    break
                if not main_included[curr]:
                    if (b[nxt, 0] <= b[curr, 0]) or (b[nxt, 2] >= b[curr, 2]):
                        break
                if b[nxt, 2] < (b[curr, 2] + b[curr, 0]) / 2.0:
                    break
                if (b[nxt, 0] < b[i, 0]) and (b[nxt, 2] < b[i, 2]):
                    break
                chain.append(nxt)
            if chain:
                _union(i, chain)

    # --- titles above tables (DLA.py:383-416) ---
    for i in range(n):
        if not (keep[i] and is_table[i]):
            continue
        b = page.boxes.astype(np.float64)
        above = b[:, 3] < b[i, 3]
        aligned = vertical_iou(b)[i, :] > 0
        nontext_blockers = above & aligned & (~is_text)
        if nontext_blockers.any():
            above = above & (b[:, 3] > b[nontext_blockers, 3].max())
        included = (b[:, 0] >= b[i, 0]) & (b[:, 2] <= b[i, 2])
        heights = b[:, 3] - b[:, 1]
        dist_y = b[i, 1] - b[:, 3]
        close = dist_y <= heights
        valid = is_text & above & aligned & included & close
        if valid.any():
            valid = valid & (b[:, 3] > b[valid, 1].max())
            if valid.any():
                _union(i, np.nonzero(valid)[0].tolist())

    return page.take(keep)


def run_merges(
    page: PageBlocks,
    iou: float = DEFAULT_IOU,
    filter_dup: bool = True,
    merge_visual: bool = False,
) -> PageBlocks:
    """Full merge stack in production order (``DLA.py:149-177``;
    ``ocr_app.py:990`` runs with ``filter_dup=True, merge_visual=False``;
    the visual merges remain reachable behind the flag like the default
    ``analyze()`` signature ``DLA.py:137``)."""
    if filter_dup:
        page = run_duplicate_filter(page, iou=iou)
    if merge_visual:
        page = merge_formula_text(page)
        page = merge_text_figure_table(page)
    return page


# ---------------------------------------------------------------------------
# Reading order: recursive XY-cut (our deterministic replacement for the
# reference's VLM linearization step, PageProcessor.py:92-104).
# ---------------------------------------------------------------------------


def _largest_gap(starts: np.ndarray, ends: np.ndarray):
    """Largest gap between merged interval runs of a 1-D projection.
    Returns ``(gap_size, cut_position)`` or ``(0.0, None)`` when the
    projection is contiguous. Ties pick the lowest-coordinate gap."""
    order = np.argsort(starts, kind="stable")
    best_gap, best_cut = 0.0, None
    cur_end = None
    for j in order:
        s, e = float(starts[j]), float(ends[j])
        if cur_end is not None and s - cur_end > best_gap:
            best_gap = s - cur_end
            best_cut = (cur_end + s) / 2.0
        cur_end = e if cur_end is None else max(cur_end, e)
    return best_gap, best_cut


def xy_cut_order(boxes: np.ndarray, min_gap: float = 0.0) -> List[int]:
    """Recursive XY-cut reading order: at each step, binary-split the
    region at the single largest whitespace gap across both axes (ties
    prefer the vertical split, i.e. horizontal bands); bands read top→
    bottom, columns left→right; leaves with no separating gap are ordered
    by (y0, x0, index). Deterministic for any input."""
    b = np.asarray(boxes, dtype=np.float64)
    n = len(b)
    if n == 0:
        return []

    def rec(idx: np.ndarray) -> List[int]:
        if len(idx) <= 1:
            return idx.tolist()
        y_gap, y_cut = _largest_gap(b[idx, 1], b[idx, 3])
        x_gap, x_cut = _largest_gap(b[idx, 0], b[idx, 2])
        if max(y_gap, x_gap) <= min_gap or (y_cut is None and x_cut is None):
            key = np.lexsort((idx, b[idx, 0], b[idx, 1]))
            return idx[key].tolist()
        if y_gap >= x_gap:
            lo, cut = b[idx, 1], y_cut
        else:
            lo, cut = b[idx, 0], x_cut
        first = idx[lo < cut]
        second = idx[lo >= cut]
        if not len(first) or not len(second):  # degenerate; stop recursing
            key = np.lexsort((idx, b[idx, 0], b[idx, 1]))
            return idx[key].tolist()
        return rec(first) + rec(second)

    return rec(np.arange(n))
