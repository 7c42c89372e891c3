"""Ship gate for a CREStereo checkpoint vs the bundled one.

Compares a candidate eval_stereo.json (written by tools/eval_stereo.py
--ckpt <candidate>) against the committed eval_stereo.json (bundled
ckpt) on the three gate axes fixed in round 4's verdict:

  1. in-dist  : crestereo bad1 must be <= bundled (no in-dist regression)
  2. OOD      : crestereo epe AND bad1 must improve
  3. real clip: crestereo clip lr_bad1 must materially improve (>= 10%)

Prints a PASS/FAIL table and exits 0 only if all three pass.
Usage: python tools/gate_crestereo.py /tmp/eval_v2.json [eval_stereo.json]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    cand_path = sys.argv[1]
    base_path = sys.argv[2] if len(sys.argv) > 2 else "eval_stereo.json"
    cand = json.load(open(cand_path))
    base = json.load(open(base_path))

    rows = []

    def axis(name, c, b, better, required):
        ok = better(c, b)
        rows.append((name, c, b, ok, required))
        return ok

    c_in = cand["metrics"]["crestereo"]["all"]
    b_in = base["metrics"]["crestereo"]["all"]
    g1 = axis("in-dist bad1 (<= bundled)", c_in["bad1"], b_in["bad1"],
              lambda c, b: c <= b + 1e-4, True)

    c_ood = cand["ood_metrics"]["crestereo"]["all"]
    b_ood = base["ood_metrics"]["crestereo"]["all"]
    g2a = axis("OOD epe (improves)", c_ood["epe"], b_ood["epe"],
               lambda c, b: c < b, True)
    g2b = axis("OOD bad1 (improves)", c_ood["bad1"], b_ood["bad1"],
               lambda c, b: c < b, True)

    c_clip = cand["clip_lr_consistency"]["crestereo"]["lr_bad1"]
    b_clip = base["clip_lr_consistency"]["crestereo"]["lr_bad1"]
    g3 = axis("clip lr_bad1 (>=10% better)", c_clip, b_clip,
              lambda c, b: c <= 0.9 * b, True)

    # context rows (not gated): the shipped default config's quality
    for fam, label in (("metrics", "in-dist"), ("ood_metrics", "OOD"),
                       ("mono_cues_metrics", "mono-cues")):
        for m in ("hybrid_conf_filled",):
            if m in cand.get(fam, {}) and m in base.get(fam, {}):
                rows.append((f"[info] {label} {m} bad1",
                             cand[fam][m]["all"]["bad1"],
                             base[fam][m]["all"]["bad1"], None, False))

    print(f"{'axis':38s} {'candidate':>10s} {'bundled':>10s}  verdict")
    for name, c, b, ok, req in rows:
        v = "" if ok is None else ("PASS" if ok else "FAIL")
        print(f"{name:38s} {c:10.4f} {b:10.4f}  {v}")
    ship = g1 and g2a and g2b and g3
    print("\nSHIP" if ship else "\nDO NOT SHIP (keep bundled ckpt)")
    return 0 if ship else 1


if __name__ == "__main__":
    sys.exit(main())
