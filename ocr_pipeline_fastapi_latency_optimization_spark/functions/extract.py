"""Per-turn extraction: mask → stamp → skeleton → serialize → enrich.

Pure functions shared verbatim by the Spark ``mapInPandas`` stage
(``operators/extraction.py``) and the single-node pandas oracle
(``oracle.py``) — two drivers, one library, so per-turn outputs are
bit-identical by construction (the north-rule equality bar).

Reference behaviors re-expressed here:

* X1 region mask (``ContentMasker.py:60-62``): dropped blocks simply do
  not contribute to the skeleton (span deletion instead of white-out).
* X2 placeholder stamp (``ContentMasker.py:64-80``): preserved
  table/figure blocks are replaced by sentinel tags carrying
  ``(turn_idx, kind, k)`` with per-kind counters assigned once, in block
  order, so the stamp counters and the "crop" counters can never diverge
  (INV-3; the reference gets this only via shared iteration order,
  ``DLA.py:640-645`` ↔ ``ContentMasker.py:56-77``).
* X4' serializer: deterministic markdown rendering of preserved blocks
  (replaces the nondeterministic per-crop VLM call,
  ``MarkdownEnricher.py:96-98``).
* JN1/JN4 enrichment (``MarkdownEnricher.py:24-67``): tolerant regex
  parse of sentinels, dict lookup with "missing crop" fallback, unmatched
  text preserved as-is.
* P9 code-fence strip (``PageProcessor.py:116``).
* A6 page concat with ``\\n\\n---\\n\\n`` (``PageProcessor.py:112``) for
  multi-page pdf-layout payloads.
"""

from __future__ import annotations

import json
import re
from typing import Dict, List, Optional, Tuple

from .merges import preprocess_page, run_merges, xy_cut_order
from .tokenize import (
    Block,
    classify_payload,
    merge_adjacent_text_blocks,
    parse_layout_json,
    score_blocks,
    tokenize_html,
    tokenize_plain,
    _normalize_inline,
)

PAGE_SEP = "\n\n---\n\n"  # PageProcessor.py:112
MISSING_FMT = "[missing {key}]"  # "Missing Crop" analog, MarkdownEnricher.py:92

# Sentinel grammar (the placeholder tag analog, ContentMasker.py:66-80).
def sentinel(turn_idx: int, kind: str, k: int) -> str:
    return f"[[TURN {turn_idx} {kind}_{k}]]"


# Tolerant parse — mirrors the forgiving regex of MarkdownEnricher.py:24-27
# (case-insensitive, separators mangled, optional index → missing-crop path).
SENTINEL_RE = re.compile(
    r"\[\[\s*turn[\s_\\]*([0-9]+)[\s_\\]+(figure|table)(?:[^0-9\]]*([0-9]+))?[^\]]*\]\]",
    re.IGNORECASE,
)


def serialize_block(payload_json: str) -> str:
    """Deterministic replacement for the per-crop VLM call (X4).

    Payload is a self-describing JSON envelope:
      ``{"type": "table_rows", "rows": [[...], ...]}`` → markdown pipe table
      ``{"type": "caption", "text": "..."}``          → figure line
      ``{"type": "raw", "text": "..."}``              → normalized text
    """
    try:
        payload = json.loads(payload_json)
    except (ValueError, TypeError):
        return _normalize_inline(str(payload_json))
    ptype = payload.get("type")
    if ptype == "table_rows":
        rows = payload.get("rows") or []
        rows = [[str(c) for c in r] for r in rows if r]
        if not rows:
            text = _normalize_inline(str(payload.get("text", "")))
            return f"| {text} |" if text else "| |"
        width = max(len(r) for r in rows)
        rows = [r + [""] * (width - len(r)) for r in rows]
        lines = ["| " + " | ".join(rows[0]) + " |"]
        lines.append("|" + " --- |" * width)
        for r in rows[1:]:
            lines.append("| " + " | ".join(r) + " |")
        return "\n".join(lines)
    if ptype == "caption":
        cap = _normalize_inline(str(payload.get("text", "")))
        return f"![figure] {cap}" if cap else "![figure]"
    return _normalize_inline(str(payload.get("text", "")))


def enrich_skeleton(skeleton: str, replacements: Dict[str, str]) -> str:
    """Single-pass sentinel substitution with dict lookup
    (``MarkdownEnricher.py:62-67`` semantics): parseable tags resolve via
    ``replacements['{kind}_{k}']`` or a missing-crop message; a tag with
    no index resolves to the missing message for the bare kind; text that
    never matches the regex is left untouched."""

    def cb(m: re.Match) -> str:
        kind = m.group(2).lower()
        idx = m.group(3)
        key = f"{kind}_{int(idx)}" if idx is not None else kind
        return replacements.get(key, MISSING_FMT.format(key=key))

    return SENTINEL_RE.sub(cb, skeleton)


def strip_code_fences(text: str) -> str:
    """P9: drop every ``` occurrence (``PageProcessor.py:116``)."""
    return text.replace("```", "")


# ---------------------------------------------------------------------------
# skeleton builders per payload kind
# ---------------------------------------------------------------------------

Span = Tuple[int, int, str, bool]
Preserved = Tuple[str, int, str]  # (kind, k, payload_json)


def _assemble(
    blocks: List[Block], turn_idx: int
) -> Tuple[str, List[Span], List[Preserved]]:
    """Shared mask+stamp walk: one pass over scored blocks in document
    order assigns per-kind counters (INV-3), emits the skeleton and the
    preserved-block payloads."""
    parts: List[str] = []
    spans: List[Span] = []
    preserved: List[Preserved] = []
    counters = {"figure": 0, "table": 0}
    for blk in blocks:
        spans.append((blk.start, blk.end, blk.label, blk.kept))
        if not blk.kept:
            continue
        if blk.label == "table":
            k = counters["table"]
            counters["table"] += 1
            payload = json.dumps(
                {"type": "table_rows", "rows": blk.rows or [], "text": blk.text},
                ensure_ascii=False,
                sort_keys=True,
            )
            preserved.append(("table", k, payload))
            parts.append(sentinel(turn_idx, "table", k))
        elif blk.label == "figure":
            k = counters["figure"]
            counters["figure"] += 1
            payload = json.dumps(
                {"type": "caption", "text": blk.text},
                ensure_ascii=False,
                sort_keys=True,
            )
            preserved.append(("figure", k, payload))
            parts.append(sentinel(turn_idx, "figure", k))
        else:
            parts.append(blk.text)
    return "\n\n".join(parts), spans, preserved


def _extract_plain(text: str, turn_idx: int):
    blocks = tokenize_plain(text)
    return _assemble(blocks, turn_idx)


def _extract_html(text: str, turn_idx: int):
    blocks = tokenize_html(text)
    blocks = merge_adjacent_text_blocks(blocks, text)
    blocks = score_blocks(blocks)
    return _assemble(blocks, turn_idx)


def _extract_pdf(payload: dict, turn_idx: int, merge_visual: bool):
    """The pdf-layout branch: per page — preprocess (P1/P2/P4/O1) →
    merges (M1a-d, optionally M2-M6) → XY-cut reading order → mask
    abandon blocks, stamp table/figure sentinels, keep text/formula
    block text; pages joined by the page separator (A6).

    Spans for layout payloads carry block order, not char offsets
    (offsets are meaningless for box-addressed content): entries are
    ``(-1, -1, label, kept)`` in reading order.
    """
    counters = {"figure": 0, "table": 0}
    page_texts: List[str] = []
    spans: List[Span] = []
    preserved: List[Preserved] = []
    for page in payload.get("pages", []):
        if not isinstance(page, dict):
            continue
        width = float(page.get("w", 1654))
        height = float(page.get("h", 2339))
        raw = [b for b in page.get("blocks", []) if isinstance(b, dict)]
        pb = preprocess_page(raw, width, height)
        pb = run_merges(pb, merge_visual=merge_visual)
        order = xy_cut_order(pb.boxes)
        parts: List[str] = []
        for j in order:
            label = pb.classes[j]
            body = _normalize_inline(pb.texts[j])
            kept = label != "abandon"
            spans.append((-1, -1, label, kept))
            if not kept:
                continue
            if label == "table":
                k = counters["table"]
                counters["table"] += 1
                preserved.append(
                    (
                        "table",
                        k,
                        json.dumps(
                            {"type": "raw", "text": pb.texts[j]},
                            ensure_ascii=False,
                            sort_keys=True,
                        ),
                    )
                )
                parts.append(sentinel(turn_idx, "table", k))
            elif label == "figure":
                k = counters["figure"]
                counters["figure"] += 1
                preserved.append(
                    (
                        "figure",
                        k,
                        json.dumps(
                            {"type": "caption", "text": body},
                            ensure_ascii=False,
                            sort_keys=True,
                        ),
                    )
                )
                parts.append(sentinel(turn_idx, "figure", k))
            elif body:
                parts.append(body)
        page_texts.append("\n\n".join(parts))
    return PAGE_SEP.join(page_texts), spans, preserved


def extract_turn(
    text: Optional[str], turn_idx: int, merge_visual: bool = False
) -> dict:
    """Stage-1 result for one turn: classify → tokenize → merge → score →
    mask+stamp. Returns kind, skeleton, spans, preserved payloads and
    block counters. Never raises on malformed payloads (X5/X7 analog:
    degrade, don't fail — ``OCR.py:140-147``)."""
    if text is None:
        text = ""
    kind = classify_payload(text)
    try:
        if kind == "pdf":
            payload = parse_layout_json(text)
            skeleton, spans, preserved = _extract_pdf(payload, turn_idx, merge_visual)
        elif kind == "html":
            skeleton, spans, preserved = _extract_html(text, turn_idx)
        else:
            skeleton, spans, preserved = _extract_plain(text, turn_idx)
    except Exception as exc:  # error-sentinel row, never a task failure
        skeleton, spans, preserved = f"[extraction-error {type(exc).__name__}]", [], []
    n_kept = sum(1 for s in spans if s[3])
    n_dropped = len(spans) - n_kept
    return {
        "kind": kind,
        "skeleton": skeleton,
        "spans": spans,
        "preserved": preserved,
        "n_blocks_kept": n_kept,
        "n_blocks_dropped": n_dropped,
    }


def finalize_turn(skeleton: str, preserved: List[Preserved]) -> str:
    """Stage-2 for one turn (the oracle's inline version of the Spark
    enrichment join): serialize preserved blocks, substitute sentinels,
    strip code fences."""
    replacements = {f"{kind}_{k}": serialize_block(p) for kind, k, p in preserved}
    return strip_code_fences(enrich_skeleton(skeleton, replacements))


def extract_turn_full(
    text: Optional[str], turn_idx: int, merge_visual: bool = False
) -> dict:
    """extract + finalize in one call — the per-turn oracle path."""
    stage1 = extract_turn(text, turn_idx, merge_visual=merge_visual)
    extracted = finalize_turn(stage1["skeleton"], stage1["preserved"])
    stage1["extracted_text"] = extracted
    stage1["chars_extracted"] = len(extracted)
    return stage1
