"""Characterize the random-feature LPIPS substitute (models/lpips.py:random_params).

VERDICT round-2 weak #7: ``lpips_rand`` is functional but uncharacterized.  Two
checks, printed as a markdown table for BENCHMARKS.md:

1. Controlled degradations of the 6 bundled faces (blur / noise / down-up
   resampling at two strengths each): does lpips_rand increase monotonically
   with degradation strength, and how does it rank-correlate with PSNR/SSIM
   across all degraded variants?
2. Real val dumps (experiments/*/val_images/**.png): Spearman rank correlation
   of lpips_rand(SR, GT) vs PSNR(SR, GT) over every dumped sample.

Run: python tools/characterize_lpips_rand.py
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from hcflow_tpu.data.imresize import imresize  # noqa: E402
from hcflow_tpu.data.util import modcrop, read_img, scan_images  # noqa: E402
from hcflow_tpu.models import lpips as lpips_mod  # noqa: E402
from hcflow_tpu.utils.metrics import calculate_psnr_ssim  # noqa: E402


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))


def gauss_blur(img, sigma):
    from scipy.ndimage import gaussian_filter

    return np.stack(
        [gaussian_filter(img[..., c], sigma) for c in range(img.shape[2])], -1
    )


def degrade_suite(img, rng):
    out = {}
    for s in (1.0, 2.0):
        out[f"blur{s:g}"] = np.clip(gauss_blur(img, s), 0, 1)
    for s in (0.02, 0.06):
        out[f"noise{s:g}"] = np.clip(img + rng.normal(0, s, img.shape), 0, 1)
    for f in (2, 4):
        lo = imresize(img, 1.0 / f)
        out[f"downup{f}"] = np.clip(imresize(lo, float(f)), 0, 1)[: img.shape[0],
                                                                 : img.shape[1]]
    return out


def main():
    metric = lpips_mod.make_metric(lpips_mod.random_params(seed=0))

    # ---- 1: controlled degradations
    paths = scan_images("/root/reference/datasets/example_face_8X/HR")
    rng = np.random.default_rng(0)
    names = None
    lp_rows, ps_rows = [], []
    for p in paths:
        hr = modcrop(read_img(p), 4)
        suite = degrade_suite(hr, rng)
        names = list(suite)
        lp_rows.append([metric(v, hr) for v in suite.values()])
        ps_rows.append([calculate_psnr_ssim(v.astype(np.float32), hr, 4)[0]
                        for v in suite.values()])
    lp = np.array(lp_rows)
    ps = np.array(ps_rows)

    print("## lpips_rand characterization (tools/characterize_lpips_rand.py)\n")
    print("Controlled degradations of the 6 bundled faces (mean over images):\n")
    print("| degradation | PSNR (dB) | lpips_rand |")
    print("|---|---|---|")
    for j, n in enumerate(names):
        print(f"| {n} | {ps[:, j].mean():.2f} | {lp[:, j].mean():.4f} |")

    mono_blur = np.mean(lp[:, names.index("blur2")] > lp[:, names.index("blur1")])
    mono_noise = np.mean(lp[:, names.index("noise0.06")] > lp[:, names.index("noise0.02")])
    mono_down = np.mean(lp[:, names.index("downup4")] > lp[:, names.index("downup2")])
    rho = np.mean([spearman(lp[i], -ps[i]) for i in range(len(paths))])
    print(f"\nmonotone vs strength: blur {mono_blur:.0%}, noise {mono_noise:.0%}, "
          f"down-up {mono_down:.0%}; per-image Spearman(lpips_rand, -PSNR) "
          f"= {rho:.3f}\n")

    # ---- 2: real val dumps
    pat = re.compile(r"SR_(\w+)_([\d.]+)_(\d+)\.png$")
    gt_dir = "/root/reference/datasets/example_face_8X/HR"
    pairs = []
    for root, _, files in os.walk("experiments"):
        for f in files:
            m = pat.search(f)
            if not m:
                continue
            gt_path = os.path.join(gt_dir, f"{m.group(1)}.png")
            if os.path.isfile(gt_path):
                pairs.append((os.path.join(root, f), gt_path, float(m.group(2))))
    if pairs:
        lps, psnrs = [], []
        for sr_p, gt_p, _heat in pairs:
            sr = read_img(sr_p)
            gt = modcrop(read_img(gt_p), 4)
            if sr.shape != gt.shape:
                continue
            lps.append(metric(sr, gt))
            psnrs.append(calculate_psnr_ssim(sr, gt, 4)[0])
        rho_v = spearman(np.array(lps), -np.array(psnrs))
        print(f"Real val dumps ({len(lps)} SR samples from experiments/): "
              f"Spearman(lpips_rand, -PSNR) = {rho_v:.3f}")


if __name__ == "__main__":
    main()
