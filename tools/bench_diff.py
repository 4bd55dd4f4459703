"""Per-query diff between two full bench artifacts (BENCH_FULL_r*.json,
written by bench.py):

    python tools/bench_diff.py BENCH_FULL_r13.json BENCH_FULL_r14.json

Prints a markdown report: calibration drift, the CORE / headline totals
(raw and normalized), and a per-query table of raw + NORMALIZED ratios,
sorted by normalized ratio, with queries present in only one artifact
listed separately. Normalization divides each side by its own
calibration probe (relative to calibration_ref_sec), so the ratio
column isolates engine change from host drift — the attribution the
round-13 verdict could not do from truncated artifacts.

Only queries in BOTH artifacts enter the table; a |normalized ratio - 1|
above NOTE_THRESHOLD gets a flag column so the round log can quote the
outliers directly.
"""

from __future__ import annotations

import json
import sys

NOTE_THRESHOLD = 0.25  # flag normalized swings beyond +-25%


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)  # tolerate driver-wrapped artifacts


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old_p, new_p = sys.argv[1], sys.argv[2]
    old, new = _load(old_p), _load(new_p)
    cal_o = old.get("calibration_sec")
    cal_n = new.get("calibration_sec")
    ref = new.get("calibration_ref_sec") or old.get("calibration_ref_sec") or 1.0
    # normalization factor per side: multiply a raw timing by this to
    # get its host-neutral value (same formula bench.py applies to the
    # totals)
    f_o = (ref / cal_o) if cal_o else 1.0
    f_n = (ref / cal_n) if cal_n else 1.0

    print(f"## bench diff: {old_p} -> {new_p}\n")
    if cal_o and cal_n:
        print(
            f"calibration {cal_o:.3f}s -> {cal_n:.3f}s "
            f"(host drift x{cal_n / cal_o:.3f}; ref {ref}s)"
        )
    for key in ("core_total", "headline_total_normalized", "core_total_normalized"):
        if key in old and key in new:
            print(f"{key}: {old[key]} -> {new[key]}")
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    rows = []
    for q in shared:
        raw_ratio = qn[q] / qo[q] if qo[q] else float("inf")
        norm_ratio = (qn[q] * f_n) / (qo[q] * f_o) if qo[q] else float("inf")
        rows.append((norm_ratio, raw_ratio, q))
    rows.sort(reverse=True)
    if rows:
        import math

        # geomean over finite positive ratios only: a 0 timing on either
        # side yields log(0)/inf and would crash or garble the report —
        # such degenerate rows stay in the table but are called out here
        finite = [
            r[0] for r in rows if 0.0 < r[0] < float("inf")
        ]
        excluded = len(rows) - len(finite)
        geo = (
            math.exp(sum(math.log(r) for r in finite) / len(finite))
            if finite
            else float("nan")
        )
        note = f" ({excluded} zero/inf ratio(s) excluded)" if excluded else ""
        print(
            f"\nshared queries: {len(rows)}; normalized-ratio geomean "
            f"x{geo:.3f} (1.0 = flat round-over-round){note}\n"
        )
        print("| query | old s | new s | raw x | normalized x | |")
        print("|---|---|---|---|---|---|")
        for norm_ratio, raw_ratio, q in rows:
            flag = "<<" if abs(norm_ratio - 1.0) > NOTE_THRESHOLD else ""
            print(
                f"| {q} | {qo[q]} | {qn[q]} | {raw_ratio:.2f} "
                f"| {norm_ratio:.2f} | {flag} |"
            )
    if only_old:
        print(f"\nleft the headline: {', '.join(only_old)}")
    if only_new:
        print(f"joined the headline: {', '.join(only_new)}")


if __name__ == "__main__":
    main()
