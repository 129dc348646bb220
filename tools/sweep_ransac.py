"""RANSAC hard-end study: recall vs hypothesis count vs escalation.

The reference evaluates with Open3D's ADAPTIVE criteria —
``RANSACConvergenceCriteria(4_000_000, 10_000)`` (FCGF,
/root/reference/FCGF_APR/scripts/test_apr.py:150-155) / ``(50_000, 1_000)``
(Predator, lib/benchmark_utils.py:218-223) — so its trial count grows as the
inlier ratio falls.  The rebuild fixes a parallel hypothesis batch; this
tool maps where a fixed batch loses and whether in-program escalation
(``ransac_pose(escalation_factor=...)``) recovers it.

Protocol: controlled correspondence sets at the eval protocol's scale
(M = 5000 matched pairs, the reference's subsample size) with an EXACT
inlier ratio p — p*M true matches under a random SE(3) pose (0.1 m jitter,
inside the 0.3 m checker threshold), the rest matched to uniform noise.
This isolates the hypothesis-count question from encoder quality: recall
at ratio p is purely P(some sampled 4-tuple is all-inlier ∧ scoring picks
it), the quantity Open3D's confidence schedule adapts to.  Expected scaling
P(hit) ~ 1 - (1 - p^4)^H gives the analytic reference line printed
alongside.

    python tools/sweep_ransac.py [--pairs 50] [--m 5000]
        [--ratios 0.02,0.03,0.05,0.08,0.12] [--hyps 8192,32768,131072,262144]
        [--esc_base 32768 --esc_factor 8 --esc_min_inliers 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_set(rng, m, ratio, extent=40.0, jitter=0.1):
    # pure numpy: building 150+ sets with on-device ops costs one
    # multi-second tunnel round trip EACH (the per-dispatch latency trap,
    # docs/PERF.md measurement methodology) — scipy matches
    # rotation_from_euler's zyx intrinsic convention
    from scipy.spatial.transform import Rotation

    n_inl = max(int(round(m * ratio)), 4)
    src = rng.uniform(-extent, extent, (m, 3)).astype(np.float32)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = Rotation.from_euler(
        "ZYX", rng.uniform(-0.5, 0.5, 3)).as_matrix().astype(np.float32)
    t[:3, 3] = rng.uniform(-20, 20, 3)
    tgt = (src @ t[:3, :3].T + t[:3, 3]).astype(np.float32)
    tgt += rng.normal(0, jitter / np.sqrt(3), tgt.shape).astype(np.float32)
    outl = rng.permutation(m)[n_inl:]
    tgt[outl] = rng.uniform(-extent, extent, (len(outl), 3)).astype(np.float32)
    return src, tgt.astype(np.float32), t


def errors(t_est, t_gt):
    dt = np.linalg.norm(t_est[:3, 3] - t_gt[:3, 3])
    cos = (np.trace(t_est[:3, :3].T @ t_gt[:3, :3]) - 1) / 2
    dr = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    return dt, dr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=50)
    ap.add_argument("--m", type=int, default=5000)
    ap.add_argument("--ratios", default="0.02,0.03,0.05,0.08,0.12")
    ap.add_argument("--hyps", default="8192,32768,131072,262144")
    ap.add_argument("--esc_base", type=int, default=32768)
    ap.add_argument("--esc_factor", type=int, default=8)
    ap.add_argument("--esc_min_inliers", type=int, default=30)
    ap.add_argument("--esc_rungs", type=int, default=0,
                    help="when > 0, add a second escalation column with "
                         "this many rungs + the confidence trigger")
    ap.add_argument("--esc_confidence", type=float, default=0.999)
    ap.add_argument("--thresh", type=float, default=0.3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from apr_tpu.registration.ransac import ransac_pose

    ratios = [float(x) for x in args.ratios.split(",")]
    hyps = [int(x) for x in args.hyps.split(",")]

    rng = np.random.default_rng(7)
    sets = {r: [make_set(rng, args.m, r) for _ in range(args.pairs)]
            for r in ratios}

    # (num_hypotheses, esc_factor, esc_rungs, esc_confidence)
    configs = [(h, 0, 1, 0.0) for h in hyps]
    configs.append((args.esc_base, args.esc_factor, 1, 0.0))
    if args.esc_rungs > 0:
        configs.append((args.esc_base, args.esc_factor, args.esc_rungs,
                        args.esc_confidence))
    print(f"# pairs={args.pairs} m={args.m} thresh={args.thresh} "
          f"success=RTE<2m ∧ RRE<5°", flush=True)
    print(f"# esc config: base={args.esc_base} x{args.esc_factor} when "
          f"best inliers < {args.esc_min_inliers}; conf-trigger column: "
          f"rungs={args.esc_rungs} conf={args.esc_confidence}", flush=True)
    hdr = "ratio  analytic32k " + " ".join(
        f"H={h//1024}k" + ("" if not e else
                           (f"esc{r}c" if c > 0 else "esc"))
        for h, e, r, c in configs)
    print(hdr, flush=True)
    for r in ratios:
        cells = []
        times = []
        for h, esc, rungs, conf in configs:
            succ = 0
            # submit every pair asynchronously, sync ONCE per config: a
            # per-pair device->host sync pays the tunnel's multi-second
            # round-trip latency up to 750 times per sweep
            t0 = time.time()
            results = []
            for i, (src, tgt, t_gt) in enumerate(sets[r]):
                key = jax.random.PRNGKey(1000 * i + h + esc)
                res = ransac_pose(
                    key, jnp.asarray(src), jnp.asarray(tgt),
                    distance_threshold=args.thresh,
                    num_hypotheses=h,
                    escalation_factor=esc,
                    escalation_min_inliers=args.esc_min_inliers,
                    escalation_rungs=rungs,
                    escalation_confidence=conf,
                )
                results.append(res.transform)
            transforms = [np.array(t) for t in results]  # one drain
            t_total = time.time() - t0
            for t_est, (_, _, t_gt) in zip(transforms, sets[r]):
                dt, dr = errors(t_est, t_gt)
                succ += int(dt < 2.0 and dr < 5.0)
            cells.append(succ / args.pairs)
            times.append(t_total / args.pairs)
        analytic = 1 - (1 - r ** 4) ** 32768
        print(f"{r:5.2f}  {analytic:10.3f}  "
              + "  ".join(f"{c:.3f}" for c in cells)
              + "   | s/pair: "
              + " ".join(f"{t:.3f}" for t in times), flush=True)


if __name__ == "__main__":
    main()
