#!/usr/bin/env python
"""Validate committed benchmark artifacts; exit nonzero on impossible values.

Run by ``make artifacts`` after regenerating (VERDICT r3 ask #3: a negative
kernel time and stale round numbers shipped unnoticed).  Checks:

* benches/results.json       — every ms > 0; m=1 verify median present
* benches/kernel_profile.json — no negative times; flags missing shard rows
* benches/scaling_results.md  — no efficiency above 100.5% in measured rows
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
errors: list[str] = []
warnings: list[str] = []


def check_results():
    path = os.path.join(HERE, "results.json")
    try:
        with open(path) as f:
            rows = json.load(f)
    except (OSError, json.JSONDecodeError) as exc:
        errors.append(f"results.json unreadable: {exc}")
        return
    m1_median = None
    for row in rows:
        if row.get("ms") is not None and row["ms"] <= 0:
            errors.append(f"results.json: non-positive ms in {row}")
        if row.get("group") == "rangeproof-verify" and row.get("config") == "n=64 m=1":
            m1_median = row.get("median_us_per_proof")
    if m1_median is None:
        warnings.append("results.json: m=1 verify median missing (old format)")
    elif m1_median >= 1040:
        warnings.append(
            f"results.json: m=1 verify median {m1_median} us >= 1040 baseline"
        )


def check_kernel_profile():
    path = os.path.join(HERE, "kernel_profile.json")
    try:
        with open(path) as f:
            prof = json.load(f)
    except (OSError, json.JSONDecodeError) as exc:
        errors.append(f"kernel_profile.json unreadable: {exc}")
        return

    def walk(key, val):
        if isinstance(val, dict):
            for k, v in val.items():
                walk(f"{key}.{k}", v)
        elif isinstance(val, (int, float)) and val is not True and val is not False:
            if ("ms" in key or "_s" in key) and val is not None and val < 0:
                errors.append(f"kernel_profile.json: negative time {key} = {val}")

    for k, v in prof.items():
        walk(k, v)
    missing = [d for d in (1, 2, 4, 8) if f"msm20_shard_d{d}" not in prof]
    if missing:
        warnings.append(
            f"kernel_profile.json: msm20_shard_d{missing} not yet captured "
            "(run benches/kernel_profile.py shard on the chip)"
        )


def check_scaling():
    path = os.path.join(HERE, "scaling_results.md")
    try:
        text = open(path).read()
    except OSError as exc:
        errors.append(f"scaling_results.md unreadable: {exc}")
        return
    for m in re.finditer(r"efficiency=\s*([0-9.]+)%", text):
        val = float(m.group(1))
        if val > 100.5:
            errors.append(f"scaling_results.md: impossible efficiency {val}%")


if __name__ == "__main__":
    check_results()
    check_kernel_profile()
    check_scaling()
    for w in warnings:
        print(f"WARN: {w}")
    for e in errors:
        print(f"ERROR: {e}")
    if errors:
        sys.exit(1)
    print("artifacts ok" + (f" ({len(warnings)} warnings)" if warnings else ""))
