#!/usr/bin/env python3
"""Round-over-round adjudication of the sf1 sweep's per-family walls.

Usage: python3 tools/soak_delta.py <prev_SOAK.md> <cur_SOAK.md> [out_md]
       python3 tools/soak_delta.py <git-rev> SOAK.md      # prev from git

The sf0.1 bench hides sf1-only regressions (the q_graph_jaccard class
of bug: a plan that collapses only once the data outgrows a broadcast
or a partition). The sweep's "Full-registry sf1 sweep" SOAK.md section
records per-family wall seconds and a worst query; this compares two
revisions of that table, NORMALIZED by each run's post-sweep
calibration ratio (the "N.NN after" figure the section prints), and
flags families whose normalized wall moved more than FLAG_RATIO with
an absolute floor — the same adjudication contract as
tools/bench_delta.py, at sweep granularity.

Purely a dev tool — NOT part of the shipped library.
"""
import os
import re
import subprocess
import sys

FLAG_RATIO = 1.3
ABS_FLOOR = 5.0  # seconds of family wall; below this, scheduler noise

ROW_RE = re.compile(
    r"^\|+\s*(q_\w+)\s*\|\s*(\d+)\s*\|\s*([0-9.]+)\s*\|\s*(q_\w+)\s*\(([0-9.]+)\)")
CAL_AFTER_RE = re.compile(r"([0-9.]+)\s+after")


def load(path_or_rev):
    if os.path.exists(path_or_rev):
        text = open(path_or_rev).read()
    else:  # a git revision: read SOAK.md out of it
        text = subprocess.check_output(
            ["git", "show", f"{path_or_rev}:SOAK.md"], text=True)
    m = re.search(r"## Full-registry sf1 sweep.*?(?=\n## |\Z)", text, re.S)
    if not m:
        print(f"{path_or_rev}: no sf1 sweep section", file=sys.stderr)
        sys.exit(2)
    sec = m.group(0)
    cal = CAL_AFTER_RE.search(sec)
    ratio = float(cal.group(1)) if cal else 1.0
    fams = {}
    for line in sec.splitlines():
        r = ROW_RE.match(line.strip())
        if r:
            fams[r.group(1)] = (int(r.group(2)), float(r.group(3)),
                                r.group(4), float(r.group(5)))
    if not fams:
        print(f"{path_or_rev}: sweep section has no family rows", file=sys.stderr)
        sys.exit(2)
    return fams, ratio


def main():
    prev_src, cur_src = sys.argv[1], sys.argv[2]
    out_md = sys.argv[3] if len(sys.argv) > 3 else None
    prev, p_ratio = load(prev_src)
    cur, c_ratio = load(cur_src)

    lines = [
        "# sf1 sweep delta — per-family walls, calibration-normalized",
        "",
        f"prev cal {p_ratio:.2f}, cur cal {c_ratio:.2f}; flagged when the "
        f"normalized family wall moves > {FLAG_RATIO}x and either side >= "
        f"{ABS_FLOOR}s. A family-count change invalidates its comparison "
        "(rendered 'resized').",
        "",
        "| family | prev n | cur n | prev wall s | cur wall s | norm delta "
        "| worst now | verdict |",
        "|---|---|---|---|---|---|---|---|",
    ]
    flagged = []
    for fam in sorted(set(prev) | set(cur)):
        if fam not in prev or fam not in cur:
            only = "cur" if fam in cur else "prev"
            lines.append(f"| {fam} | — | — | — | — | — | — | only-{only} |")
            continue
        pn, pw, _, _ = prev[fam]
        cn, cw, cworst, cworst_s = cur[fam]
        if pn != cn:
            lines.append(f"| {fam} | {pn} | {cn} | {pw:.1f} | {cw:.1f} | — "
                         f"| {cworst} ({cworst_s}) | resized |")
            continue
        delta = (cw / c_ratio) / (pw / p_ratio) if pw > 0 else float("inf")
        verdict = ""
        if delta > FLAG_RATIO and max(pw, cw) >= ABS_FLOOR:
            verdict = "SLOWER?"
            flagged.append(fam)
        elif delta < 1 / FLAG_RATIO and max(pw, cw) >= ABS_FLOOR:
            verdict = "improved"
        mark = f"**{delta:.2f}x**" if verdict == "SLOWER?" else f"{delta:.2f}x"
        lines.append(f"| {fam} | {pn} | {cn} | {pw:.1f} | {cw:.1f} | {mark} "
                     f"| {cworst} ({cworst_s}) | {verdict} |")
    doc = "\n".join(lines) + "\n"
    if out_md:
        with open(out_md, "w") as f:
            f.write(doc)
    print(doc)
    if flagged:
        print(f"families slower than {FLAG_RATIO}x normalized: {flagged}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
