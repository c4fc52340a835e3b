"""Single-process oracle: runs the shared core turn-by-turn over transcript
rows. This is the reference-faithful ground truth the Spark pipeline's triple
P/R (>= 0.95, BASELINE.json) is measured against — same ``core`` module, so
any divergence is a distribution bug, not a semantics bug.
"""

from __future__ import annotations

from collections import defaultdict

from . import core


def oracle_triples(rows: list[dict]) -> list[dict]:
    """Per-turn extraction under stable (conv_id, turn_idx) ordering."""
    out = []
    for row in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        for t in core.extract_triples(row["text"]):
            out.append({
                "conv_id": row["conv_id"], "turn_idx": row["turn_idx"],
                "subj": t["subj"], "pred": t["pred"], "obj": t["obj"],
                "confidence": t["confidence"], "mtype": t["mtype"],
            })
    return out


def oracle_mentions(rows: list[dict]) -> list[dict]:
    out = []
    for row in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        for m in core.extract_mentions(row["text"]):
            out.append({
                "conv_id": row["conv_id"], "turn_idx": row["turn_idx"],
                "mention_id": m["mention_id"], "surface": m["surface"],
                "span_start": m["span_start"], "span_end": m["span_end"],
                "mtype": m["mtype"],
            })
    return out


def oracle_chunks(rows: list[dict], max_tokens: int = 200,
                  overlap: int = 2) -> list[dict]:
    """Conversation-level chunking: concatenate turns in turn_idx order, then
    the quirk-faithful chunker (texts.py:124-128 defaults)."""
    by_conv: dict[str, list[dict]] = defaultdict(list)
    for row in rows:
        by_conv[row["conv_id"]].append(row)
    out = []
    for conv_id in sorted(by_conv):
        turns = sorted(by_conv[conv_id], key=lambda r: r["turn_idx"])
        text = " ".join(r["text"] for r in turns)
        for idx, chunk in enumerate(core.chunker(text, max_tokens, overlap)):
            out.append({"conv_id": conv_id, "chunk_idx": idx,
                        "chunk_text": chunk})
    return out


def oracle_verified_triples(rows: list[dict], alias_set: set[str]) -> list[dict]:
    """Triples surviving the offline verification filter (verify_entity,
    ent_extraction.py:344-355): obj — and subj unless it is the reserved
    'self' — must verify against the alias vocabulary."""
    out = []
    for t in oracle_triples(rows):
        if not core.verify_offline(t["obj"], t["mtype"], alias_set):
            continue
        if t["subj"] != core.SELF_SUBJECT and not core.verify_offline(
                t["subj"], t["mtype"], alias_set):
            continue
        out.append(t)
    return out


def precision_recall(predicted: list[tuple], gold: list[tuple]) -> tuple[float, float]:
    pset, gset = set(predicted), set(gold)
    if not pset or not gset:
        return (1.0 if pset == gset else 0.0,) * 2
    tp = len(pset & gset)
    return tp / len(pset), tp / len(gset)
