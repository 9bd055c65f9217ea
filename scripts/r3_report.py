"""Summarize /tmp/r3_queue.log (r3_tpu_queue.sh output) into a ranked
table: experiment name, Mrays/s, delta vs base, plus probe summaries.

Usage: python scripts/r3_report.py [/tmp/r3_queue.log]
"""

import json
import re
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_queue.log"
    rows = []
    for ln in open(path):
        m = re.match(r'^\{"exp": "([^"]+)"\} (\{.*\})$', ln.strip())
        if m:
            try:
                d = json.loads(m.group(2))
            except json.JSONDecodeError:
                continue
            rows.append((m.group(1), d.get("value"), d))
    base = next((v for n, v, _ in rows if n == "base" and v), None)
    print(f"{'experiment':24} {'Mrays/s':>9} {'vs base':>8}  detail")
    for n, v, d in sorted(rows, key=lambda r: -(r[1] or 0)):
        rel = f"{(v - base) / base:+7.1%}" if (base and v) else "    n/a"
        dragon = (d.get("dragon_1m") or {}).get("mrays_per_s")
        extra = f"dragon_1m={dragon}" if dragon else ""
        print(f"{n:24} {v or 0:9.3f} {rel:>8}  {extra}")


if __name__ == "__main__":
    main()
