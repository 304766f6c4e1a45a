#!/usr/bin/env python3
"""Self-adjudicating bench comparison (round N vs round N-1).

Usage: python3 tools/bench_delta.py <prev_bench> <cur_bench> [out_md]

Each input is either a driver-written BENCH_r{N}.json (whose `tail`
field holds the — possibly front-truncated — raw bench stdout) or a
file containing the bench's single JSON line. Per-query triples and the
calibration ratio are extracted by regex, so truncation never loses the
queries that survived into the tail.

Adjudication: per query, compare min-of-3 wall times NORMALIZED by each
record's calibration ratio. Records written since round 10 carry a
per-query BAND ratio (the worse of the two calibration probes that
bracket the query in run order, sampled every ~20 queries); when
present it replaces the global median ratio for that query, so a
sustained contention band normalizes itself out. A query whose band
ratio exceeds the tolerance in either record is additionally
auto-adjudicated "contention band (auto)" if it still flags — no human
adjudication needed for machine-load artifacts. A query is flagged only
if its normalized delta exceeds FLAG_RATIO and its absolute time is
above ABS_FLOOR (sub-0.3 s timings are scheduler noise at local[32];
zarr scans have shown 1.6x swings on identical code).

A failed pass is recorded by the bench as -1.0; a query whose current
min is negative is rendered FAILED and exits nonzero — a hard failure
must never adjudicate as a speedup.

Annotations: tools/bench_notes.json holds {"applies_to_prev":
"<prev basename>", "notes": {query: note}}. Notes apply ONLY when the
prev record's basename matches applies_to_prev — a stale note from an
old round cannot suppress a later regression. Flagged queries WITH an
applicable note render as "expected"; flagged queries without one
render as "REGRESSION?" and exit nonzero so the round log shows the
miss.

Purely a dev tool — NOT part of the shipped library.
"""
import json
import os
import re
import sys

FLAG_RATIO = 1.3   # same tolerance the calibration probe uses
ABS_FLOOR = 0.3    # seconds; below this, deltas are scheduler noise

TRIPLE_RE = re.compile(r'"(q_\w+)":\[([0-9.eE+,\s-]+)\]')
RATIO_RE = re.compile(r'"median_ratio":([0-9.eE+-]+)')
# band_ratio is a flat {"q":num,...} object, so the first } terminates it
BANDS_RE = re.compile(r'"band_ratio":\{([^}]*)\}')
PAIR_RE = re.compile(r'"(q_\w+)":([0-9.eE+-]+)')
# ingest-artifact pre-pass timings (memoized graph/pair builds): flat
# {"name":sec,...} — names are NOT q_-prefixed, so a generic pair regex
ARTS_RE = re.compile(r'"artifacts":\{([^}]*)\}')
# artifact names may carry '-', '.', etc. — match any quoted key so no
# artifact is silently dropped from the pre-pass table
ANY_PAIR_RE = re.compile(r'"([^"]+)":([0-9.eE+-]+)')
# canonical-plan fingerprints (r17+): {"q":"hex12",...}. When BOTH
# records carry the same fingerprint for a flagged query, the logical
# plan is identical by construction — the flag is environment variance
# and auto-clears without a human note. (A custom expression's INTERNAL
# change keeps its fingerprint; deliberate internal changes still carry
# a bench_notes entry.)
FPS_RE = re.compile(r'"plan_fp":\{([^}]*)\}')
FP_PAIR_RE = re.compile(r'"(q_\w+)":"([0-9a-f]*)"')


def load_record(path):
    """-> (per-query min-of-3, global ratio, per-query band ratios, truncated?)"""
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if isinstance(d, dict) and "tail" in d:
            raw = d["tail"]
    except ValueError:
        pass  # raw bench line (or a fragment) — regex handles it
    mins = {}
    for name, nums in TRIPLE_RE.findall(raw):
        vals = [float(x) for x in nums.split(",") if x.strip()]
        if vals:
            mins[name] = min(vals)
    m = RATIO_RE.search(raw)
    ratio = float(m.group(1)) if m else 1.0
    bands = {}
    b = BANDS_RE.search(raw)
    if b:
        bands = {q: float(v) for q, v in PAIR_RE.findall(b.group(1))}
    arts = {}
    a = ARTS_RE.search(raw)
    if a:
        arts = {n: float(v) for n, v in ANY_PAIR_RE.findall(a.group(1))}
    fps = {}
    fpm = FPS_RE.search(raw)
    if fpm:
        fps = {q: h for q, h in FP_PAIR_RE.findall(fpm.group(1)) if h}
    truncated = not raw.lstrip().startswith("{")
    return mins, ratio, bands, arts, fps, truncated


def main():
    prev_path, cur_path = sys.argv[1], sys.argv[2]
    out_md = sys.argv[3] if len(sys.argv) > 3 else None
    notes_path = os.path.join(os.path.dirname(__file__), "bench_notes.json")
    notes = {}
    if os.path.exists(notes_path):
        doc = json.load(open(notes_path))
        if doc.get("applies_to_prev") == os.path.basename(prev_path):
            notes = doc.get("notes", {})
        else:
            print(f"note file targets {doc.get('applies_to_prev')!r}, "
                  f"prev is {os.path.basename(prev_path)!r} — notes ignored",
                  file=sys.stderr)

    prev, prev_ratio, prev_bands, prev_arts, prev_fps, prev_trunc = \
        load_record(prev_path)
    cur, cur_ratio, cur_bands, cur_arts, cur_fps, cur_trunc = \
        load_record(cur_path)
    shared = sorted(set(prev) & set(cur))
    if not shared:
        print("no shared queries between records", file=sys.stderr)
        sys.exit(2)

    rows, flagged_unexplained, failed = [], [], []
    for q in shared:
        note = notes.get(q, "")
        if cur[q] < 0:
            # the bench's failed-pass sentinel: never let a broken query
            # read as a delta (negative math would render it 'improved')
            failed.append(q)
            rows.append((q, prev[q], cur[q], float("nan"), "FAILED", note))
            continue
        if prev[q] < 0:
            rows.append((q, prev[q], cur[q], float("nan"),
                         "recovered (prev failed)", note))
            continue
        # per-query band ratio (round 10+) beats the record-global median:
        # it localizes a contention band to the queries it actually hit
        p_factor = prev_bands.get(q, prev_ratio)
        c_factor = cur_bands.get(q, cur_ratio)
        p_norm = prev[q] / p_factor
        c_norm = cur[q] / c_factor
        delta = c_norm / p_norm if p_norm > 0 else float("inf")
        flagged = delta > FLAG_RATIO and max(prev[q], cur[q]) >= ABS_FLOOR
        banded = max(prev_bands.get(q, 1.0), cur_bands.get(q, 1.0)) > FLAG_RATIO
        plan_same = (q in prev_fps and prev_fps.get(q) == cur_fps.get(q))
        verdict = ""
        if flagged:
            if note:
                verdict = "expected"
            elif plan_same:
                # both records fingerprint the same canonicalized plan:
                # nothing to re-adjudicate, the delta is environmental
                verdict = "plan-identical (auto)"
            elif banded:
                # the record itself proves machine load straddled this
                # query — auto-adjudicated, not a plan regression
                verdict = "contention band (auto)"
            else:
                verdict = "REGRESSION?"
                flagged_unexplained.append(q)
        elif delta < 1 / FLAG_RATIO and max(prev[q], cur[q]) >= ABS_FLOOR:
            verdict = "improved"
        rows.append((q, prev[q], cur[q], delta, verdict, note))

    hdr = (f"prev ratio {prev_ratio:.4f}"
           + (f" + {len(prev_bands)} band ratios" if prev_bands else "")
           + (" (tail truncated)" if prev_trunc else "")
           + f", cur ratio {cur_ratio:.4f}"
           + (f" + {len(cur_bands)} band ratios" if cur_bands else "")
           + (" (tail truncated)" if cur_trunc else ""))
    lines = [
        "# Bench delta — calibration-normalized, min-of-3 per query",
        "",
        f"Calibration: {hdr}. Normalized delta = "
        "(cur_min/cur_ratio) / (prev_min/prev_ratio); flagged only when "
        f"> {FLAG_RATIO}x AND either side >= {ABS_FLOOR}s. "
        "Notes come from tools/bench_notes.json.",
        "",
        "| query | prev min s | cur min s | norm delta | verdict | note |",
        "|---|---|---|---|---|---|",
    ]
    for q, p, c, d, v, note in rows:
        if v == "FAILED" or v.startswith("recovered"):
            mark = "—"
        elif v.startswith("REG"):
            mark = f"**{d:.2f}x**"
        else:
            mark = f"{d:.2f}x"
        lines.append(f"| {q} | {p:.3f} | {c:.3f} | {mark} | {v} | {note} |")
    only_prev = sorted(set(prev) - set(cur))
    only_cur = sorted(set(cur) - set(prev))
    if only_prev or only_cur:
        lines += ["", f"Coverage drift: only-prev={only_prev} "
                      f"only-cur={only_cur} (front-truncated tails drop "
                      "the alphabetically-early queries)."]
    # ingest-artifact pre-pass: these one-shot builds (memoized graphs,
    # pair expansions) are timed OUTSIDE the per-query triples, so a
    # regression there would otherwise hide from this table entirely.
    # Single-pass timings get the global-ratio normalization only (no
    # per-artifact bands); notes key as "artifact:<name>".
    if prev_arts or cur_arts:
        lines += ["", "## Artifact pre-pass", "",
                  "| artifact | prev s | cur s | norm delta | verdict | note |",
                  "|---|---|---|---|---|---|"]
        for n in sorted(set(prev_arts) | set(cur_arts)):
            note = notes.get(f"artifact:{n}", "")
            if n not in prev_arts or n not in cur_arts:
                which = "new" if n not in prev_arts else "dropped"
                lines.append(f"| {n} | {prev_arts.get(n, float('nan')):.3f} "
                             f"| {cur_arts.get(n, float('nan')):.3f} "
                             f"| — | {which} | {note} |")
                continue
            p_norm = prev_arts[n] / prev_ratio
            c_norm = cur_arts[n] / cur_ratio
            delta = c_norm / p_norm if p_norm > 0 else float("inf")
            verdict = ""
            if delta > FLAG_RATIO and max(prev_arts[n], cur_arts[n]) >= ABS_FLOOR:
                verdict = "expected" if note else "REGRESSION?"
                if not note:
                    flagged_unexplained.append(f"artifact:{n}")
                mark = f"**{delta:.2f}x**" if not note else f"{delta:.2f}x"
            else:
                if delta < 1 / FLAG_RATIO and \
                        max(prev_arts[n], cur_arts[n]) >= ABS_FLOOR:
                    verdict = "improved"
                mark = f"{delta:.2f}x"
            lines.append(f"| {n} | {prev_arts[n]:.3f} | {cur_arts[n]:.3f} "
                         f"| {mark} | {verdict} | {note} |")
    doc = "\n".join(lines) + "\n"
    if out_md:
        with open(out_md, "w") as f:
            f.write(doc)
    print(doc)
    if failed:
        print(f"FAILED queries in current record (bench -1 sentinel): "
              f"{failed}", file=sys.stderr)
    if flagged_unexplained:
        print(f"UNEXPLAINED slowdowns (> {FLAG_RATIO}x normalized): "
              f"{flagged_unexplained}", file=sys.stderr)
    if failed or flagged_unexplained:
        sys.exit(1)


if __name__ == "__main__":
    main()
