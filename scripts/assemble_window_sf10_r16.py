#!/usr/bin/env python
"""Assemble WINDOW_SF10_r16.json from the batched replay log.

Round-16 rotation (see run_window_sf10_r16.sh): the 49 names whose
last sf10 verification dated to r11/r12, six never-replayed driver
shapes, dup_span_stats (oracle-cost exclusion lifted — the oracle
completes in ~12 s at sf10 on the current corpus), and the two
formerly oracle-environment-bound names now hash-checked through
their registered ALT oracles (equal-to-primary pinned at sf0.01 by
tests/test_round16.py).
"""
from __future__ import annotations

import json
import re
import sys

LOGS = sys.argv[1:] or ["/tmp/window_sf10_r16_batched.log"]

ok_set = set()
rows_only_map = {}
alt_names = {"copurchase_triangle_count", "embedding_cluster_keep_best"}
for log in LOGS:
    with open(log, "rb") as fh:
        for raw in fh.read().decode("utf-8", "replace").splitlines():
            line = raw.rsplit("\r", 1)[-1].strip()
            m = re.match(r"^([a-z_0-9]+): OK$", line)
            if m:
                ok_set.add(m.group(1))
            m = re.match(r"^([a-z_0-9]+): rows=(\d+) \(no oracle\)$", line)
            if m and m.group(1) != "entry":
                rows_only_map[m.group(1)] = int(m.group(2))
ok = sorted(ok_set)
rows_only = [
    {"name": n, "rows": r} for n, r in sorted(rows_only_map.items())
]

art = {
    "sf_dir": "/tmp/sfbench/sf10",
    "driver_memory": "24g",
    "note": (
        "Round-16 driver-window replay at sf10 (plain driver_sim sessions, batched with a 25-minute per-batch timeout). Rotation per the r15 verdict's #7: the 49-name cohort last sf10-verified in r11/r12 ages back in, plus six driver shapes never replayed at sf10, plus dup_span_stats — whose r15 oracle-cost exclusion no longer holds (the position-stream oracle completes in ~12 s at sf10 on the current corpus, measured in scripts/dupspan_decompose_r16.py) — plus the two formerly oracle-environment-bound names, now HASH-CHECKED at sf10 through registered alternative oracles (Query.alt_oracle; SIM_ALT_ORACLE=1): embedding_cluster_keep_best against a collapse-first CTE mirroring the Spark rewrite's algebra, copurchase_triangle_count against a basket-fan-out + JOIN-counted wedge probe. Both alternatives are pinned equal to their independently-formulated primaries at sf0.01/sf0.1 (tests/test_round16.py + in-session checks), so an sf10 hash match against the alternative carries the primary's evidence. Exclusions are down to TWO, each rung-covered: graph_ann_top10 (oracle shares the quadratic kNN ranked-CTE block; PLANTED_TRUTH recall@10 = 1.0 at sf1/sf10) and simhash_wide_dup_clusters (oracle bit-replay crosses the token stream with range(60), ~24e9 intermediate rows; PLANTED_TRUTH precision 1.0 at 10M docs)."
    ),
    "n_window": len(ok) + len(rows_only),
    "n_ok": len(ok),
    "queries_ok": sorted(ok),
    "rows_only": rows_only,
    "alt_oracle_checked": sorted(n for n in ok_set & alt_names),
    "excluded": [
        "graph_ann_top10",
        "simhash_wide_dup_clusters",
    ],
}
with open("WINDOW_SF10_r16.json", "w") as fh:
    json.dump(art, fh, indent=1)
print(f"n_ok={len(ok)} rows_only={len(rows_only)} alt={art['alt_oracle_checked']}")
