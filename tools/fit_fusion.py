"""Fit per-bucket learned-fusion weights from an exported feature dump.

The offline half of the learned-fusion loop (reference: ab_testing.rs
LearnedWeights — fitted scoring variants served through the A/B manager).
Protocol (round-4 verdict #1):

- category-stratified split: per suite category, even case index -> FIT,
  odd -> HOLDOUT (never touched by fitting or selection);
- per query-bucket pairwise logistic over (gold, non-gold) feature
  differences within each fit query (rank-SVM-style; bias cancels);
- blend weight ``lam`` selected by 2-fold cross-validation INSIDE the fit
  split (offline simulation: re-rank exported rows by
  ``(1-lam)·final_n + lam·σ(w·f+b)``, score r@10 with the query's full
  gold count as denominator, map as tie-break);
- reports holdout metrics per category/bucket, learning curves
  (25/50/100% of fit), and feature importances (w · feature std).

Writes ``shodh_tpu/data/learned_fusion.json`` (buckets with lam>0 only)
plus a full report JSON next to the dump. The final arbiter is the real
suite run with SHODH_LEARNED_FUSION=1 — this tool's offline metrics
ignore the downstream companion/diversity reranks by construction.

Usage:
    python tools/fit_fusion.py --dump /tmp/ff_full.jsonl \
        --out shodh_tpu/data/learned_fusion.json --report /tmp/fit_report.json
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

LAMS = [round(0.1 * i, 1) for i in range(11)]
L2 = 1e-3
ITERS = 400
LR = 0.5
FINAL_N_COL = 4  # feature index of final_n (blend base)


def expand_quads(X: np.ndarray, quad_pairs) -> np.ndarray:
    """Append products of the given base-feature index pairs (mirrors
    LearnedFusionModel._expand at inference — keep in sync)."""
    if not quad_pairs:
        return X
    cols = [X] + [(X[:, i] * X[:, j])[:, None] for i, j in quad_pairs]
    return np.concatenate(cols, axis=1)


def load_dump(path: str, quad_pairs=None):
    lines = Path(path).read_text().splitlines()
    header = json.loads(lines[0])
    cases = [json.loads(l) for l in lines[1:]]
    for c in cases:
        rows = np.asarray([r[2:] for r in c["rows"]], np.float32)
        labels = np.asarray([r[0] for r in c["rows"]], np.int32)
        c["X"] = expand_quads(rows, quad_pairs) if quad_pairs else rows
        c["y"] = labels
    return header, cases


def split_cases(cases):
    """Even/odd per category, in case_id order (deterministic)."""
    by_cat = defaultdict(list)
    for c in sorted(cases, key=lambda c: c["case_id"]):
        by_cat[c["category"]].append(c)
    fit, hold = [], []
    for cat in sorted(by_cat):
        for i, c in enumerate(by_cat[cat]):
            (fit if i % 2 == 0 else hold).append(c)
    return fit, hold


def pairs_matrix(cases, bucket):
    """Stack (gold - non-gold) feature differences for a bucket."""
    diffs = []
    for c in cases:
        if c["bucket"] != bucket:
            continue
        X, y = c["X"], c["y"]
        gi = np.flatnonzero(y == 1)
        ni = np.flatnonzero(y == 0)
        if len(gi) == 0 or len(ni) == 0:
            continue
        # cap non-gold side per query so huge pools don't dominate
        ni = ni[:200]
        d = X[gi][:, None, :] - X[ni][None, :, :]
        diffs.append(d.reshape(-1, X.shape[1]))
    if not diffs:
        return None
    return np.concatenate(diffs, 0)


def fit_logistic(D):
    """Pairwise logistic: min mean log(1+exp(-D·w)) + L2·|w|²; plain GD."""
    n, f = D.shape
    w = np.zeros(f, np.float64)
    losses = []
    for _ in range(ITERS):
        z = D @ w
        # stable sigmoid of -z
        s = np.where(z >= 0, 1.0 / (1.0 + np.exp(-z)), np.exp(z) / (1.0 + np.exp(z)))
        loss = float(np.mean(np.logaddexp(0.0, -z)) + L2 * (w @ w))
        grad = -(D.T @ (1.0 - s)) / n + 2 * L2 * w
        w -= LR * grad
        losses.append(loss)
    return w, losses


def sim_metrics(cases, bucket_w, lam_by_bucket, rerank_m=128, m_by_bucket=None):
    """Offline re-rank simulation -> per-case r@10/ap, aggregated per
    category and per bucket. Cases whose bucket has no model keep base order."""
    per_cat = defaultdict(lambda: {"r10": [], "ap": []})
    per_bucket = defaultdict(lambda: {"r10": [], "ap": []})
    for c in cases:
        X, y = c["X"], c["y"]
        spec = bucket_w.get(c["bucket"])
        lam = lam_by_bucket.get(c["bucket"], 0.0)
        scores = X[:, FINAL_N_COL].astype(np.float64).copy()
        if spec is not None and lam > 0.0:
            w, b = spec
            bm = (m_by_bucket or {}).get(c["bucket"], rerank_m)
            m = min(bm, len(scores))
            z = X[:m] @ w + b
            p = 1.0 / (1.0 + np.exp(-z))
            scores[:m] = (1.0 - lam) * scores[:m] + lam * p
        # deterministic: score desc, original rank asc (orig order = rows order)
        order = np.lexsort((np.arange(len(scores)), -scores))
        ranked_y = y[order]
        n_gold = max(1, c["n_gold"])
        r10 = float(ranked_y[:10].sum()) / n_gold
        hits, ap = 0, 0.0
        for i, lab in enumerate(ranked_y[:10]):
            if lab:
                hits += 1
                ap += hits / (i + 1.0)
        ap /= n_gold
        per_cat[c["category"]]["r10"].append(r10)
        per_cat[c["category"]]["ap"].append(ap)
        per_bucket[c["bucket"]]["r10"].append(r10)
        per_bucket[c["bucket"]]["ap"].append(ap)
    agg = lambda d: {
        k: {"r@10": float(np.mean(v["r10"])), "map": float(np.mean(v["ap"])), "n": len(v["r10"])}
        for k, v in sorted(d.items())
    }
    return agg(per_cat), agg(per_bucket)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", required=True)
    ap.add_argument("--out", default=str(REPO / "shodh_tpu/data/learned_fusion.json"))
    ap.add_argument("--report", default="/tmp/fit_fusion_report.json")
    ap.add_argument("--rerank-m", type=int, default=128)
    ap.add_argument(
        "--domain", default="dialogue",
        help="store domain the dump was exported from (the engine applies "
        "the artifact only to stores whose majority doc class matches)",
    )
    ap.add_argument(
        "--quad", default="",
        help="comma-separated base feature names; all pairwise products "
        "are appended as interaction features (fit + artifact + inference)",
    )
    ap.add_argument(
        "--m-sweep", action="store_true",
        help="after lam selection, CV-sweep per-bucket rerank depth m over "
        "(64, 128, 192, 256) at lam* and ship the winner per bucket",
    )
    args = ap.parse_args()

    # resolve quad pairs against the dump's base feature map
    head_probe = json.loads(Path(args.dump).read_text().splitlines()[0])
    base_names = head_probe["feature_names"]
    quad_pairs = []
    if args.quad:
        sel = [n.strip() for n in args.quad.split(",") if n.strip()]
        missing = [n for n in sel if n not in base_names]
        if missing:
            raise SystemExit(f"--quad names not in dump: {missing}")
        idx = [base_names.index(n) for n in sel]
        quad_pairs = [[i, j] for a, i in enumerate(idx) for j in idx[a + 1:]]
        print(f"{len(quad_pairs)} interaction pairs from {sel}")

    header, cases = load_dump(args.dump, quad_pairs)
    names = list(header["feature_names"]) + [
        f"{base_names[i]}*{base_names[j]}" for i, j in quad_pairs
    ]
    fit, hold = split_cases(cases)
    buckets = sorted({c["bucket"] for c in cases})
    print(f"{len(cases)} cases -> fit {len(fit)} / holdout {len(hold)}; buckets {buckets}")

    report = {"feature_names": names, "quad_pairs": quad_pairs,
              "buckets": {}, "curves": {}}
    bucket_w, lam_by_bucket = {}, {}
    m_by_bucket_fit: dict[str, int] = {}

    for bucket in buckets:
        bcases = [c for c in fit if c["bucket"] == bucket]
        if len(bcases) < 10:
            print(f"[{bucket}] only {len(bcases)} fit cases — skipping")
            continue
        # -- 2-fold CV inside fit for lam selection
        half = len(bcases) // 2
        folds = [(bcases[:half], bcases[half:]), (bcases[half:], bcases[:half])]
        cv_scores = {lam: [] for lam in LAMS}
        for tr, va in folds:
            D = pairs_matrix(tr, bucket)
            if D is None:
                continue
            w, _ = fit_logistic(D)
            b = -float(np.mean(np.concatenate([c["X"] for c in tr], 0) @ w))
            for lam in LAMS:
                pc, _pb = sim_metrics(va, {bucket: (w, b)}, {bucket: lam}, args.rerank_m)
                tot = sum(m["n"] for m in pc.values()) or 1
                r10 = sum(m["r@10"] * m["n"] for m in pc.values()) / tot
                mp = sum(m["map"] * m["n"] for m in pc.values()) / tot
                cv_scores[lam].append((r10, mp))
        mean_cv = {
            lam: (float(np.mean([s[0] for s in v])), float(np.mean([s[1] for s in v])))
            for lam, v in cv_scores.items() if v
        }
        # pick lam: max r@10, map tie-break, smaller lam on ties
        best = max(mean_cv.items(), key=lambda kv: (round(kv[1][0], 4), round(kv[1][1], 4), -kv[0]))
        lam_star = best[0]
        # -- refit on all fit cases
        D = pairs_matrix(fit, bucket)
        w, losses = fit_logistic(D)
        Xall = np.concatenate([c["X"] for c in fit if c["bucket"] == bucket], 0)
        b = -float(np.mean(Xall @ w))
        bucket_w[bucket] = (w, b)
        lam_by_bucket[bucket] = lam_star
        # optional per-bucket rerank-depth sweep at lam* (same CV folds)
        m_star = args.rerank_m
        if args.m_sweep:
            m_cv = {}
            for m_try in (64, 128, 192, 256):
                vals = []
                for tr, va in folds:
                    D2 = pairs_matrix(tr, bucket)
                    if D2 is None:
                        continue
                    w2, _ = fit_logistic(D2)
                    b2 = -float(np.mean(np.concatenate([c["X"] for c in tr], 0) @ w2))
                    pc, _pb = sim_metrics(
                        va, {bucket: (w2, b2)}, {bucket: lam_star},
                        m_by_bucket={bucket: m_try},
                    )
                    tot = sum(mm["n"] for mm in pc.values()) or 1
                    vals.append((
                        sum(mm["r@10"] * mm["n"] for mm in pc.values()) / tot,
                        sum(mm["map"] * mm["n"] for mm in pc.values()) / tot,
                    ))
                if vals:
                    m_cv[m_try] = (
                        float(np.mean([v[0] for v in vals])),
                        float(np.mean([v[1] for v in vals])),
                    )
            if m_cv:
                m_star = max(
                    m_cv, key=lambda m: (round(m_cv[m][0], 4), round(m_cv[m][1], 4), -m)
                )
        m_by_bucket_fit[bucket] = m_star
        stds = Xall.std(0)
        importances = sorted(
            zip(names, (w * stds).tolist()), key=lambda kv: -abs(kv[1])
        )
        report["buckets"][bucket] = {
            "n_fit_cases": len(bcases),
            "n_pairs": int(D.shape[0]),
            "lam_cv": {str(l): v for l, v in mean_cv.items()},
            "lam_star": lam_star,
            "m_star": m_star,
            "final_loss": losses[-1],
            "w": w.tolist(),
            "b": b,
            "importances": importances[:10],
        }
        print(f"[{bucket}] pairs={D.shape[0]} lam*={lam_star} cv_r10={best[1][0]:.4f} "
              f"top feats: {[(n, round(v,3)) for n, v in importances[:5]]}")

        # learning curve: fit on 25/50/100% of fit cases, eval on holdout
        curve = {}
        for frac in (0.25, 0.5, 1.0):
            sub = bcases[: max(5, int(len(bcases) * frac))]
            Ds = pairs_matrix(sub, bucket)
            if Ds is None:
                continue
            ws, _ = fit_logistic(Ds)
            bs = -float(np.mean(np.concatenate([c["X"] for c in sub], 0) @ ws))
            pc, _ = sim_metrics(
                [c for c in hold if c["bucket"] == bucket],
                {bucket: (ws, bs)}, {bucket: lam_star},
                m_by_bucket={bucket: m_star},
            )
            tot_n = sum(m["n"] for m in pc.values()) or 1
            curve[str(frac)] = {
                "r@10": sum(m["r@10"] * m["n"] for m in pc.values()) / tot_n,
                "map": sum(m["map"] * m["n"] for m in pc.values()) / tot_n,
            }
        report["curves"][bucket] = curve

    # -- holdout evaluation: base vs learned
    base_cat, base_bucket = sim_metrics(hold, {}, {}, args.rerank_m)
    new_cat, new_bucket = sim_metrics(
        hold, bucket_w, lam_by_bucket, args.rerank_m, m_by_bucket=m_by_bucket_fit
    )
    report["holdout"] = {
        "base_per_category": base_cat,
        "learned_per_category": new_cat,
        "base_per_bucket": base_bucket,
        "learned_per_bucket": new_bucket,
        "lam": {k: v for k, v in lam_by_bucket.items()},
        "m": dict(m_by_bucket_fit),
    }
    print("\nholdout per-category (base -> learned):")
    for cat in sorted(base_cat):
        b_, n_ = base_cat[cat], new_cat[cat]
        print(f"  {cat:12s} r@10 {b_['r@10']:.4f} -> {n_['r@10']:.4f}   "
              f"map {b_['map']:.4f} -> {n_['map']:.4f}   (n={b_['n']})")

    # -- ship buckets with lam>0 (artifact stores the BASE feature map +
    # quad index pairs; inference expands products the same way fit did)
    out = {
        "feature_names": base_names,
        "quad_pairs": quad_pairs,
        "domain": args.domain,
        "rerank_m": args.rerank_m,
        "buckets": {
            bkt: {"w": bucket_w[bkt][0].tolist(), "b": bucket_w[bkt][1],
                   "lam": lam_by_bucket[bkt],
                   "m": m_by_bucket_fit.get(bkt, args.rerank_m)}
            for bkt in bucket_w if lam_by_bucket.get(bkt, 0.0) > 0.0
        },
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    Path(args.report).write_text(json.dumps(report, indent=1, default=float) + "\n")
    print(f"\nwrote {args.out} ({len(out['buckets'])} buckets) + report {args.report}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
