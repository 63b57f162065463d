"""Round-over-round bench diff: compare two BENCH_r{N}.json files and
flag per-query regressions/improvements beyond a noise threshold.

Usage:
    python tools/bench_compare.py BENCH_r05.json BENCH_r06.json [ratio]

Machine variance on this sandbox is real (~2x observed between rounds
on byte-identical code — see VERDICT r3/r5), so the default flag ratio
is 1.5x and the output labels movement, it doesn't adjudicate it:
cross-round numbers are evidence, same-round A/B timings are proof.
"""

from __future__ import annotations

import json
import sys


def load(path: str, cold: bool = False) -> dict[str, float]:
    """Accepts either bench.py's raw one-line JSON ({"queries": ...})
    or the driver's BENCH_r{N}.json wrapper, whose "tail" field embeds
    a (possibly truncated) copy of that stdout — per-query pairs are
    regex-scavenged from it in that case. Given a driver artifact,
    a sibling BENCH_LOCAL_r{N}.json (the full-suite record bench.py
    writes since r9) is preferred over the truncated tail.

    CAVEAT on driver tails: the 2000-char tail is the END of the JSON
    line, which lands mostly inside "queries_cold" — scavenged driver
    numbers are predominantly COLD timings (and last-occurrence wins
    for keys present in both maps). Compare a tail against a full
    payload with cold=True (--cold) or the diff reads as a phantom
    across-the-board improvement."""
    import os
    import re

    m = re.search(r"BENCH_r(\d+)\.json$", path)
    if m:
        local = os.path.join(
            os.path.dirname(path) or ".", f"BENCH_LOCAL_r{int(m.group(1)):02d}.json"
        )
        if os.path.exists(local):
            path = local
    text = open(path).read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict) and "queries" in doc:
        key = "queries_cold" if cold and "queries_cold" in doc else "queries"
        return doc[key]
    tail = doc.get("tail", text) if isinstance(doc, dict) else text
    pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)
    out = {
        k: float(v)
        for k, v in pairs
        if k not in ("value", "sf", "n", "rc", "cpus")
        and not k.startswith("calib_")
    }
    if not out:
        raise SystemExit(f"no per-query timings found in {path}")
    return out


def load_calibration(path: str) -> "dict[str, float] | None":
    """Per-probe values of the fixed-workload calibration (bench.py
    emits them since r10), or None for pre-calibration artifacts.
    Resolves driver artifacts to the sibling BENCH_LOCAL file first,
    then falls back to scavenging the stdout tail (the probes sit at
    the END of the JSON line precisely so the 2000-char tail keeps
    them)."""
    import os
    import re

    m = re.search(r"BENCH_r(\d+)\.json$", path)
    if m:
        local = os.path.join(
            os.path.dirname(path) or ".", f"BENCH_LOCAL_r{int(m.group(1)):02d}.json"
        )
        if os.path.exists(local):
            path = local
    text = open(path).read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict) and isinstance(doc.get("calibration"), dict):
        vals = {k: float(v) for k, v in doc["calibration"].items()}
    else:
        # driver artifact: regex the (unescaped) embedded stdout tail
        tail = doc.get("tail", text) if isinstance(doc, dict) else text
        vals = {
            k: float(v)
            for k, v in re.findall(r'"(calib_[a-z_]+)":\s*([0-9.]+)', tail)
        }
    return vals or None


def machine_factor(
    cal_old: "dict[str, float] | None", cal_new: "dict[str, float] | None"
) -> "tuple[float | None, str]":
    """Round-over-round machine factor from the calibration probes —
    the geomean of the shared probes' ratios — UNLESS the probes
    disagree: when the largest and smallest per-probe ratio differ by
    more than 1.5x, the box changed unevenly (e.g. r11: CPU flat at
    1.03x while the shuffle probe read 0.58x on a run whose queries
    drifted 1.17x SLOWER) and a blended factor would normalize in the
    wrong direction. In that case return (None, reason) and let the
    caller fall back to raw numbers + the same-round A/B protocol."""
    if not (cal_old and cal_new):
        return None, "calibration missing on one side"
    ratios = {
        k: cal_new[k] / cal_old[k]
        for k in cal_old.keys() & cal_new.keys()
        if cal_old[k] > 0
    }
    if not ratios:
        return None, "no shared calibration probes"
    hi, lo = max(ratios.values()), min(ratios.values())
    detail = ", ".join(f"{k}={v:.2f}x" for k, v in sorted(ratios.items()))
    if hi / lo > 1.5:
        return None, (
            f"probes disagree ({detail}) — uneven machine change, "
            "normalization skipped; use same-round A/B for verdicts"
        )
    prod = 1.0
    for v in ratios.values():
        prod *= v
    return prod ** (1.0 / len(ratios)), detail


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--cold"]
    cold = "--cold" in sys.argv[1:]
    if len(args) < 2:
        print(__doc__)
        return 2
    old, new = load(args[0], cold), load(args[1], cold)
    ratio = float(args[2]) if len(args) > 2 else 1.5
    # Machine-factor normalization: when BOTH artifacts carry the
    # fixed-workload calibration, divide the new timings by the VM
    # drift so the flags below reflect code, not the box. Raw numbers
    # stay in the printout (evidence, not adjudication — see header).
    cal_old, cal_new = load_calibration(args[0]), load_calibration(args[1])
    mf, why = machine_factor(cal_old, cal_new)
    if mf:
        print(f"machine factor (fixed-workload calibration): {mf:.2f}x "
              f"({why}) — per-query ratios below are divided by it")
        new = {k: v / mf for k, v in new.items()}
    elif cal_old or cal_new:
        print(f"machine factor: NOT applied — {why}")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    rows = []
    for name in sorted(set(old) & set(new)):
        a, b = old[name], new[name]
        if a <= 0 or b <= 0:
            continue
        r = b / a
        if r >= ratio or r <= 1 / ratio:
            rows.append((r, name, a, b))
    for r, name, a, b in sorted(rows, reverse=True):
        tag = "REGRESSED" if r > 1 else "improved"
        print(f"{tag:9s} {name:42s} {a:8.3f} -> {b:8.3f}  ({r:.2f}x)")
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    tot_old = sum(old[n] for n in set(old) & set(new))
    tot_new = sum(new[n] for n in set(old) & set(new))
    norm = " (machine-normalized)" if mf else ""
    print(f"shared-query total{norm}: {tot_old:.1f} -> {tot_new:.1f} s "
          f"({tot_new / tot_old:.2f}x) over {len(set(old) & set(new))} queries")
    if mf:
        raw = tot_new * mf
        print(f"shared-query total (raw):  {tot_old:.1f} -> {raw:.1f} s "
              f"({raw / tot_old:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
