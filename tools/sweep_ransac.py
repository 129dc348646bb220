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
    import jax.numpy as jnp

    from apr_tpu.geometry.se3 import apply_transform, rotation_from_euler

    n_inl = max(int(round(m * ratio)), 4)
    src = rng.uniform(-extent, extent, (m, 3)).astype(np.float32)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = np.asarray(
        rotation_from_euler(jnp.asarray(rng.uniform(-0.5, 0.5, 3))))
    t[:3, 3] = rng.uniform(-20, 20, 3)
    tgt = np.array(apply_transform(jnp.asarray(src), jnp.asarray(t)))
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

    configs = [(h, 0) for h in hyps] + [(args.esc_base, args.esc_factor)]
    print(f"# pairs={args.pairs} m={args.m} thresh={args.thresh} "
          f"success=RTE<2m ∧ RRE<5°", flush=True)
    print(f"# esc config: base={args.esc_base} x{args.esc_factor} when "
          f"best inliers < {args.esc_min_inliers}", flush=True)
    hdr = "ratio  analytic32k " + " ".join(
        f"H={h//1024}k" + ("esc" if e else "") for h, e in configs)
    print(hdr, flush=True)
    for r in ratios:
        cells = []
        times = []
        for h, esc in configs:
            succ = 0
            t_total = 0.0
            for i, (src, tgt, t_gt) in enumerate(sets[r]):
                key = jax.random.PRNGKey(1000 * i + h + esc)
                t0 = time.time()
                res = ransac_pose(
                    key, jnp.asarray(src), jnp.asarray(tgt),
                    distance_threshold=args.thresh,
                    num_hypotheses=h,
                    escalation_factor=esc,
                    escalation_min_inliers=args.esc_min_inliers,
                )
                t_est = np.array(res.transform)  # sync
                t_total += time.time() - t0
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
