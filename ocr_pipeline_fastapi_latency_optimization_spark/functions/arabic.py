"""F9: Arabic contextual shaping + bidi display reordering.

Reference parity: ``FileIngestor.py:208-221`` runs ``arabic_reshaper`` +
``python-bidi`` before drawing text onto the annotated debug image — a
presentation-layer transform. Re-expressed here as a pure pandas
function (Arrow-batched when used from Spark):

* if the same public libs the reference uses are importable, they are
  used verbatim (gated import — they are not in this container);
* otherwise a deterministic fallback implements the core of both:
  contextual letter forms derived AT IMPORT TIME from the Unicode
  character database (``unicodedata`` names of the Presentation Forms-B
  block — no hand-copied tables), lam-alef ligatures, and a simplified
  bidi step that reverses maximal Arabic runs for LTR display. The
  fallback intentionally skips the full UAX#9 algorithm (explicit
  directional controls, bracket mirroring) — documented, test-pinned.

Everything is pure and deterministic, so the pytest oracle is the
function itself run row-by-row.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Dict

# ---------------------------------------------------------------------------
# presentation-form table, built from the UCD


def _build_forms() -> Dict[str, Dict[str, str]]:
    forms: Dict[str, Dict[str, str]] = {}
    pat = re.compile(
        r"ARABIC (LETTER|LIGATURE) (.+) (ISOLATED|FINAL|INITIAL|MEDIAL) FORM$"
    )
    for cp in range(0xFB50, 0xFF00):
        ch = chr(cp)
        try:
            name = unicodedata.name(ch)
        except ValueError:
            continue
        m = pat.match(name)
        if not m:
            continue
        kind, body, form = m.groups()
        if kind == "LETTER":
            try:
                base = unicodedata.lookup(f"ARABIC LETTER {body}")
            except KeyError:
                continue
        else:  # ligatures: only LAM WITH ALEF variants are shaped here
            if not body.startswith("LAM WITH ALEF"):
                continue
            alef_body = body[len("LAM WITH ") :]
            try:
                base = "ل" + unicodedata.lookup(f"ARABIC LETTER {alef_body}")
            except KeyError:
                continue
        if len(base) <= 2:
            forms.setdefault(base, {})[form] = ch
    return forms


_FORMS = _build_forms()

# letters that never connect to the FOLLOWING letter (right-joining);
# hamza never connects at all — the standard Arabic joining classes
_NON_FORWARD = set("آأؤإاةدذ"
                   "رزوى")
_NON_JOINING = {"ء"}  # lone hamza
_LAM = "ل"
_ALEFS = set("آأإا")

# harakat & tatweel-adjacent marks are transparent to joining
_TRANSPARENT = set(chr(c) for c in range(0x064B, 0x0660)) | {"ٰ"}


def _is_arabic_letter(ch: str) -> bool:
    return ch in _FORMS or ch in _NON_JOINING or ch in _TRANSPARENT


def _connects_forward(ch: str) -> bool:
    return ch in _FORMS and ch not in _NON_FORWARD and ch not in _NON_JOINING


def _pick(ch: str, prev_connects: bool, next_joins: bool) -> str:
    table = _FORMS.get(ch)
    if not table:
        return ch
    can_forward = _connects_forward(ch)
    if prev_connects and next_joins and can_forward:
        return table.get("MEDIAL", table.get("FINAL", ch))
    if prev_connects:
        return table.get("FINAL", ch)
    if next_joins and can_forward:
        return table.get("INITIAL", table.get("ISOLATED", ch))
    return table.get("ISOLATED", ch)


def reshape_arabic(text: str) -> str:
    """Contextual-form substitution incl. lam-alef ligatures (the
    ``arabic_reshaper.reshape`` analog). Non-Arabic chars pass through;
    harakat are transparent to joining and preserved."""
    chars = list(text)
    out = []
    i = 0
    prev_connects = False
    n = len(chars)
    while i < n:
        ch = chars[i]
        if ch in _TRANSPARENT:
            out.append(ch)
            i += 1
            continue
        if ch not in _FORMS and ch not in _NON_JOINING:
            out.append(ch)
            prev_connects = False
            i += 1
            continue
        # lam-alef ligature: lam directly followed (mod harakat) by alef
        if ch == _LAM:
            j = i + 1
            while j < n and chars[j] in _TRANSPARENT:
                j += 1
            if j < n and chars[j] in _ALEFS:
                lig = _FORMS.get(_LAM + chars[j])
                if lig:
                    form = "FINAL" if prev_connects else "ISOLATED"
                    out.append(lig.get(form, lig.get("ISOLATED")))
                    out.extend(chars[i + 1 : j])  # carried harakat
                    i = j + 1
                    prev_connects = False  # ligature never joins forward
                    continue
        # next joining letter (skipping transparent marks)
        j = i + 1
        while j < n and chars[j] in _TRANSPARENT:
            j += 1
        next_joins = j < n and (chars[j] in _FORMS and chars[j] not in _NON_JOINING)
        out.append(_pick(ch, prev_connects, next_joins))
        prev_connects = _connects_forward(ch)
        i += 1
    return "".join(out)


_ARABIC_RUN = re.compile(
    "[؀-ۿݐ-ݿﭐ-﷿ﹰ-﻿]"
    "(?:[؀-ۿݐ-ݿﭐ-﷿ﹰ-﻿ ]*"
    "[؀-ۿݐ-ݿﭐ-﷿ﹰ-﻿])?"
)


def bidi_display(text: str) -> str:
    """Simplified bidi: reverse each maximal Arabic run (spaces between
    Arabic words stay inside the run) for display in an LTR context —
    the ``bidi.algorithm.get_display`` analog minus explicit directional
    controls and bracket mirroring."""
    return _ARABIC_RUN.sub(lambda m: m.group(0)[::-1], text)


# gated import resolved ONCE at module load (round-2 ADVICE #5): a failed
# import is not cached by Python, so probing inside the per-row call would
# pay a full sys.path scan + exception per row inside the pandas UDF
try:  # pragma: no cover - libs absent in this container
    import arabic_reshaper as _arabic_reshaper
    from bidi.algorithm import get_display as _get_display
except ImportError:
    _arabic_reshaper = None
    _get_display = None


def arabic_display(text: str) -> str:
    """reshape + bidi — the exact composition the reference applies
    (``FileIngestor.py:208-221``). Uses the reference's own public libs
    when importable (module-level probe), else the deterministic
    fallback above."""
    if _arabic_reshaper is not None:  # pragma: no cover - optional dep
        return _get_display(_arabic_reshaper.reshape(text))
    return bidi_display(reshape_arabic(text))


def arabic_display_udf():
    """Vectorized (Arrow-batched) column form for Spark pipelines."""
    import pandas as pd  # noqa: F401

    from pyspark.sql import functions as F, types as T

    return F.pandas_udf(
        lambda s: s.map(lambda t: arabic_display(t or "")), T.StringType()
    )
