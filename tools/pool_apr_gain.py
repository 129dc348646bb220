"""Pool per-seed PAIRED lines from validate_apr_gain.py runs.

When repetitions are run as separate invocations (--seeds 1 --seed0 k,
which makes partial progress durable), each prints its own PAIRED line per
eval distance.  This script sums the discordant counts across runs and
reprints the pooled paired analysis (delta, Wald CI, exact McNemar) —
identical math to the in-process pooling of --seeds N.

    python tools/pool_apr_gain.py log1.txt [log2.txt ...]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from validate_apr_gain import mcnemar_exact_p, paired_delta_ci  # noqa: E402

PAT = re.compile(
    r"PAIRED eval_dist=([\d.]+) apr=([\d.]+) baseline=([\d.]+) .*"
    r"discordant=(\d+)/(\d+) .* n=(\d+)")


def main(paths):
    acc = {}
    for path in paths:
        for line in open(path):
            m = PAT.search(line)
            if not m:
                continue
            dist = float(m.group(1))
            apr, base = float(m.group(2)), float(m.group(3))
            n10, n01, n = int(m.group(4)), int(m.group(5)), int(m.group(6))
            a = acc.setdefault(dist, dict(n10=0, n01=0, n=0, apr=0.0, base=0.0,
                                          runs=0))
            a["n10"] += n10
            a["n01"] += n01
            a["n"] += n
            a["apr"] += apr * n
            a["base"] += base * n
            a["runs"] += 1
    for dist in sorted(acc):
        a = acc[dist]
        d, lo, hi = paired_delta_ci(a["n01"], a["n10"], a["n"])
        p = mcnemar_exact_p(a["n01"], a["n10"])
        print(f"POOLED eval_dist={dist} runs={a['runs']} "
              f"apr={a['apr'] / a['n']:.3f} baseline={a['base'] / a['n']:.3f} "
              f"delta={d:+.3f} ci95=[{lo:+.3f},{hi:+.3f}] "
              f"discordant={a['n10']}/{a['n01']} mcnemar_p={p:.4f} n={a['n']}")


if __name__ == "__main__":
    main(sys.argv[1:])
