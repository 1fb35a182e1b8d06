"""Checkbox↔text association, session grouping, radio correction, QA pairs.

Exact re-implementation of /root/reference/ocr/association.py semantics:
  - multi-level scoring (:5-63): distance(≤100 px) + alignment(50 if
    |y_text−y_cb|<20) + position(left 30 / right 20 / else 10) +
    font min(30, h/2) + conf/2; normalized total/2.6 capped at 100
  - vertical proximity session grouping (:66-99): sort by y, new group when
    gap ≥ threshold
  - radio-group correction (:139-148): if a group has >1 marked, keep only
    the max-confidence one marked
  - QA pair assembly (:107-171)

Pure Python over per-document lists (tiny cardinality) — executed inside the
batched extraction UDF, never as a per-row Spark UDF. The relational analogue
(cross join + scoring expression + window rank-1) is exercised in
__spark_entry__ as `nearest_above_join`.
"""

from __future__ import annotations

import math


def _center(bbox: tuple[int, int, int, int]) -> tuple[float, float]:
    x, y, w, h = bbox
    return (x + w / 2.0, y + h / 2.0)


def score_association(checkbox: dict, line: dict) -> float:
    """Score one (checkbox, text line) pair — /root/reference/ocr/association.py:28-51."""
    cbx, cby = _center(checkbox["bbox"])
    tx, ty = _center(line["bbox"])
    dist = math.hypot(cbx - tx, cby - ty)
    if dist > 100:
        return 0.0
    total = 100.0 - dist
    if abs(ty - cby) < 20:
        total += 50.0
    if tx < cbx:
        total += 30.0  # text to the left
    elif tx > cbx:
        total += 20.0  # text to the right
    else:
        total += 10.0
    total += min(30.0, line["bbox"][3] / 2.0)
    total += line.get("conf", 0.0) / 2.0
    return min(100.0, total / 2.6)


def asociacion_multi_nivel(checkboxes: list[dict], lines: list[dict]) -> list[dict]:
    """Best-scoring line per checkbox (argmax) —
    /root/reference/ocr/association.py:5-63."""
    out = []
    for cb in checkboxes:
        best_line, best_score = None, 0.0
        for ln in lines:
            s = score_association(cb, ln)
            if s > best_score:
                best_score, best_line = s, ln
        enriched = dict(cb)
        enriched["text"] = best_line["text"] if best_line else ""
        enriched["association_confidence"] = round(best_score, 2)
        out.append(enriched)
    return out


def group_by_proximity(checkboxes: list[dict], gap_threshold: int = 30) -> list[list[dict]]:
    """1-D session window on y: sort by (y,x); a vertical gap >= threshold
    starts a new group — /root/reference/ocr/association.py:66-99 (and the
    duplicate at preprocessing/checkbox.py:282-314)."""
    if not checkboxes:
        return []
    cbs = sorted(checkboxes, key=lambda c: (c["bbox"][1], c["bbox"][0]))
    groups: list[list[dict]] = [[cbs[0]]]
    for prev, cur in zip(cbs, cbs[1:]):
        if cur["bbox"][1] - prev["bbox"][1] >= gap_threshold:
            groups.append([cur])
        else:
            groups[-1].append(cur)
    return groups


def correct_radio_groups(groups: list[list[dict]]) -> list[dict]:
    """Within each group, if more than one checkbox is marked keep only the
    max-confidence one marked — /root/reference/ocr/association.py:139-148."""
    out = []
    for g in groups:
        marked = [cb for cb in g if cb["marked"]]
        if len(marked) > 1:
            best = max(marked, key=lambda cb: cb["confidence"])
            for cb in g:
                corrected = dict(cb)
                if cb["marked"] and cb is not best:
                    corrected["marked"] = False
                    corrected["corregido_por_grupo"] = True
                out.append(corrected)
        else:
            out.extend(dict(cb) for cb in g)
    return out


def build_question_answer_pairs(checkboxes: list[dict], lines: list[dict]) -> list[dict]:
    """Full association flow → QA pairs
    (/root/reference/ocr/association.py:107-171)."""
    associated = asociacion_multi_nivel(checkboxes, lines)
    groups = group_by_proximity(associated)
    corrected = correct_radio_groups(groups)
    return [
        {
            "pregunta": cb.get("text", ""),
            "respuesta": "marcado" if cb["marked"] else "no marcado",
            "tipo": cb["tipo"],
            "confianza": cb.get("association_confidence", 0.0),
            "bbox_checkbox": cb["bbox"],
            "corregido_por_grupo": cb.get("corregido_por_grupo", False),
        }
        for cb in corrected
    ]
