"""Session-corrected bench history: read every BENCH_r*.json and print
one markdown table of per-query trends, corrected by the pinned
`session_norm` scan where a round recorded one.

Why (r8 verdict): rounds 7 and 8 both showed LOCKSTEP drift — every
legacy query moving 10-39% with all plan fingerprints pinned and no code
change — which is the measuring session (GC posture, page cache, CPU
contention), not the engine. bench.py therefore times a pinned
two-column lineitem scan (`session_norm`) whose plan no engine change
should ever alter; this script divides each round's query walls by that
round's norm factor so cross-round comparisons stop hand-arguing about
session noise.

Correction: corrected(q, round) = best(q, round) / factor(round), where
factor(round) = session_norm_best(round) / session_norm_best(REF) and
REF is the newest round that recorded a norm. Rounds without a norm
(r1-r7) print raw values marked with `*` — comparable only with the
lockstep caveat.

Usage:
    python tools/bench_history.py            # markdown to stdout
    python tools/bench_history.py --json     # machine-readable
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds() -> list[tuple[int, dict]]:
    out = []
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            payload = json.load(f)
        # driver artifacts wrap the bench line under "parsed"
        parsed = payload.get("parsed", payload)
        if not isinstance(parsed, dict) or "queries" not in parsed:
            # r10 lesson: the driver keeps only a ~2000-byte stdout tail
            # and the full r10 line overflowed it (parsed: None, the
            # best-of map truncated mid-line). Salvage what the tail
            # holds: the tail always ENDS with the line's tail, so the
            # LAST "queries_median"/"session_norm" fragments may be
            # recoverable even when "queries" is cut. Best effort only.
            tail = payload.get("tail") or ""
            frag = _salvage_from_tail(tail)
            if frag is None:
                continue
            parsed = frag
        out.append((int(m.group(1)), parsed))
    out.sort()
    return out


def _salvage_from_tail(tail: str) -> dict | None:
    """Recover {queries, session_norm} from a truncated artifact tail:
    the bench line's head (the best-of `queries` map) may be cut, but
    `queries_median` and `session_norm` ride later in the line and often
    survive. Uses medians AS the per-query values (marked by the caller
    only via the numbers themselves — close enough for trend tables;
    the r10 verdict used the same substitution)."""
    m = re.search(r'"queries_median":\s*(\{[^}]*\})', tail)
    n = re.search(r'"session_norm":\s*(\{[^}]*\})', tail)
    if not m:
        return None
    try:
        queries = json.loads(m.group(1))
        norm = json.loads(n.group(1)) if n else None
    except json.JSONDecodeError:
        return None
    return {"queries": queries, "session_norm": norm}


def build_table(rounds: list[tuple[int, dict]]) -> dict:
    """-> {queries: [name...], rounds: [n...], raw: {q: {r: s}},
    corrected: {q: {r: s|None}}, factor: {r: f|None}}"""
    names: list[str] = []
    for _, p in rounds:
        for q in p["queries"]:
            if q not in names:
                names.append(q)
    norm = {
        r: (p.get("session_norm") or {}).get("best") for r, p in rounds
    }
    ref_rounds = [r for r, _ in rounds if norm[r]]
    ref = norm[ref_rounds[-1]] if ref_rounds else None
    factor = {
        r: (norm[r] / ref if (norm[r] and ref) else None) for r, _ in rounds
    }
    raw: dict[str, dict[int, float]] = {q: {} for q in names}
    corrected: dict[str, dict[int, float | None]] = {q: {} for q in names}
    for r, p in rounds:
        for q, s in p["queries"].items():
            raw[q][r] = s
            corrected[q][r] = (
                round(s / factor[r], 3) if factor[r] else None
            )
    return {
        "queries": names,
        "rounds": [r for r, _ in rounds],
        "raw": raw,
        "corrected": corrected,
        "factor": factor,
        "norm_best": norm,
        "ref_round": ref_rounds[-1] if ref_rounds else None,
    }


def to_markdown(t: dict) -> str:
    rs = t["rounds"]
    lines = [
        "Session-corrected bench history (best-of-runs seconds; `*` = "
        "round recorded no session_norm, raw value shown — lockstep "
        "drift possible). Correction reference: round "
        f"r{t['ref_round']}'s norm.",
        "",
        "| query | " + " | ".join(f"r{r}" for r in rs) + " |",
        "|---|" + "|".join("---" for _ in rs) + "|",
    ]

    def cell(q: str, r: int) -> str:
        raw = t["raw"][q].get(r)
        if raw is None:
            return "—"
        c = t["corrected"][q].get(r)
        return f"{c:.3f}" if c is not None else f"{raw:.3f}\\*"

    for q in t["queries"]:
        lines.append(
            f"| {q} | " + " | ".join(cell(q, r) for r in rs) + " |"
        )
    lines.append(
        "| session_norm (raw) | "
        + " | ".join(
            f"{t['norm_best'][r]:.3f}" if t["norm_best"][r] else "—"
            for r in rs
        )
        + " |"
    )
    lines.append(
        "| norm factor vs ref | "
        + " | ".join(
            f"{t['factor'][r]:.2f}" if t["factor"][r] else "—" for r in rs
        )
        + " |"
    )
    return "\n".join(lines)


def main() -> None:
    rounds = load_rounds()
    if not rounds:
        print("no BENCH_r*.json artifacts found", file=sys.stderr)
        raise SystemExit(1)
    t = build_table(rounds)
    if "--json" in sys.argv:
        print(json.dumps(t, indent=2))
    else:
        print(to_markdown(t))


if __name__ == "__main__":
    main()
