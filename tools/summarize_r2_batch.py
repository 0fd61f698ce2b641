"""Summarize a tools/tpu_r2_batch.sh log into one table.

Pulls each bench arm's JSON line plus the smoke/micro results so the A/B
outcome is readable at a glance:

    python tools/summarize_r2_batch.py [/tmp/tpu_r2_batch.log]
"""
from __future__ import annotations

import json
import re
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r2_batch.log"
    text = open(path, encoding="utf-8", errors="replace").read()

    # smoke verdict
    m = re.search(r"^(\d+) failures / total (\d+)s$", text, re.M)
    if m:
        print(f"smoke: {m.group(1)} failures ({m.group(2)}s)")
    for line in re.findall(r"^.*FAIL.*$", text, re.M)[:20]:
        print("  " + line.strip())

    # micro kernel ms lines (bench_lnmm_q)
    for line in re.findall(r"^(?:xla|pallas|ffn).*(?:ms|TF/s).*$", text, re.M):
        print("micro: " + line.strip())
    for line in re.findall(r"^.* vs f32: cosine=.*$", text, re.M):
        print("accuracy: " + line.strip())

    # bench arms: '--- <tag>: ... ---' section headers + their JSON line
    arm = None
    results: list[tuple[str, dict]] = []
    for line in text.splitlines():
        m = re.match(r"^--- (\S+): (.*) ---$", line)
        if m and not m.group(1).endswith("rc"):
            arm = m.group(1)
        if line.startswith('{"metric"') and arm:
            try:
                results.append((arm, json.loads(line)))
            except json.JSONDecodeError:
                pass
            arm = None
    if results:
        print(f"\n{'arm':14s} {'emb/s/chip':>11s} {'vs_base':>8s} {'mfu':>6s} {'tok/s':>10s}")
        for tag, r in results:
            mfu = r.get("mfu")
            tok = r.get("tokens_per_sec")
            # mfu/tok can be None (bench.py --tiny/--no-packed emit null);
            # format the string BEFORE applying the width spec — None has
            # no __format__('>6').
            mfu_s = "-" if mfu is None else f"{mfu:.3f}"
            tok_s = "-" if tok is None else f"{tok:,.0f}"
            print(
                f"{tag:14s} {r.get('value', float('nan')):11.1f} "
                f"{r.get('vs_baseline', float('nan')):8.2f} "
                f"{mfu_s:>6} {tok_s:>10}"
            )
    else:
        print("no bench JSON lines found")


if __name__ == "__main__":
    main()
