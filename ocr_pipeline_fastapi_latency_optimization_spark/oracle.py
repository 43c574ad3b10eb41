"""Single-node pandas oracle.

Runs the *same* pure extraction functions as the Spark pipeline over a
pandas frame of transcripts — the equality bar of the north rule
(per-turn text equality under stable turn ordering, SURVEY §5). Any
divergence between this and ``operators/extraction.py`` is a bug in the
wiring, never in the semantics, because both call
``functions.extract.extract_turn`` / ``finalize_turn``.
"""

from __future__ import annotations

import pandas as pd

from .functions.extract import extract_turn_full
from .operators.extraction import STITCH_SEP


def extract_frame(transcripts: pd.DataFrame, merge_visual: bool = False) -> pd.DataFrame:
    """Per-turn extraction over a pandas transcripts frame; returns rows
    matching OUTPUT_SCHEMA, sorted by (conv_id, turn_idx)."""
    rows = []
    for conv_id, turn_idx, text in zip(
        transcripts["conv_id"], transcripts["turn_idx"], transcripts["text"]
    ):
        r = extract_turn_full(text, int(turn_idx), merge_visual=merge_visual)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": int(turn_idx),
                "extracted_text": r["extracted_text"],
                "spans": [
                    {"start": s, "end": e, "label": lb, "kept": kp}
                    for (s, e, lb, kp) in r["spans"]
                ],
                "n_blocks_kept": r["n_blocks_kept"],
                "n_blocks_dropped": r["n_blocks_dropped"],
                "chars_extracted": r["chars_extracted"],
            }
        )
    out = pd.DataFrame(
        rows,
        columns=[
            "conv_id",
            "turn_idx",
            "extracted_text",
            "spans",
            "n_blocks_kept",
            "n_blocks_dropped",
            "chars_extracted",
        ],
    )
    return out.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def stitch_frame(per_turn: pd.DataFrame) -> pd.DataFrame:
    """Oracle for the conversation stitch (A6)."""
    rows = []
    for conv_id, grp in per_turn.sort_values(
        ["conv_id", "turn_idx"], kind="stable"
    ).groupby("conv_id", sort=True):
        rows.append(
            {
                "conv_id": conv_id,
                "n_turns": len(grp),
                "chars_extracted": int(grp["chars_extracted"].sum()),
                "conversation_text": STITCH_SEP.join(grp["extracted_text"]),
            }
        )
    return pd.DataFrame(
        rows, columns=["conv_id", "n_turns", "chars_extracted", "conversation_text"]
    )
