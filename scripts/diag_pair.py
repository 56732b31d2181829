"""Offline analysis of captured loop-verification pairs: why does PnP
collapse on the drift fixture's tail pairs while F-RANSAC stays strong?"""
import glob
import sys

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.config import SLAMConfig, CameraConfig
from dynamic_visual_slam_tpu.core.camera import Intrinsics
from dynamic_visual_slam_tpu.frontend import ransac
from dynamic_visual_slam_tpu.ops import hamming

cam = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                   cx=79.5, cy=59.5)
k = Intrinsics(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)
cfg = SLAMConfig()

for path in sorted(glob.glob("/tmp/verify_pairs/pair_*.npz")):
    z = np.load(path)
    d1, uv1, m1 = z["d1"], z["uv1"], z["m1"]
    d2, uv2, m2, xyz2 = z["d2"], z["uv2"], z["m2"], z["xyz2"]
    res = hamming.match(jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1),
                        jnp.asarray(m2),
                        max_distance=float(cfg.match.max_hamming),
                        cross_check=True)
    key = jax.random.key(0)
    fm = ransac.fundamental_ransac(
        jnp.asarray(uv2)[res.train_idx], jnp.asarray(uv1), res.valid, key,
        n_hyp=cfg.ransac.fm_iterations,
        threshold=cfg.ransac.fm_threshold_px)
    fm_ok = fm.inliers & fm.valid
    pnp4 = ransac.pnp_ransac(k, jnp.asarray(xyz2)[res.train_idx],
                             jnp.asarray(uv1), fm_ok, jax.random.fold_in(key, 1),
                             n_hyp=cfg.ransac.pnp_iterations,
                             threshold=cfg.ransac.pnp_threshold_px,
                             min_inliers=cfg.ransac.min_pnp_matches,
                             refine_iters=cfg.ransac.refine_iterations)
    pnp12 = ransac.pnp_ransac(k, jnp.asarray(xyz2)[res.train_idx],
                              jnp.asarray(uv1), fm_ok,
                              jax.random.fold_in(key, 1),
                              n_hyp=cfg.ransac.pnp_iterations,
                              threshold=12.0,
                              min_inliers=cfg.ransac.min_pnp_matches,
                              refine_iters=cfg.ransac.refine_iterations)
    # cloud self-consistency: are the xyz2 points consistent with candidate's
    # own pixels uv2 under SOME pose? (PnP of candidate against itself)
    pnp_self = ransac.pnp_ransac(k, jnp.asarray(xyz2), jnp.asarray(uv2),
                                 jnp.asarray(m2), jax.random.fold_in(key, 2),
                                 n_hyp=cfg.ransac.pnp_iterations,
                                 threshold=cfg.ransac.pnp_threshold_px,
                                 min_inliers=cfg.ransac.min_pnp_matches,
                                 refine_iters=cfg.ransac.refine_iterations)
    nz = np.linalg.norm(xyz2[m2], axis=1)
    print(f"{path.split('/')[-1]:24s} fm={int(fm.n_inliers):3d} "
          f"pnp@4={int(jnp.where(pnp4.valid, pnp4.n_inliers, 0)):3d} "
          f"pnp@12={int(jnp.where(pnp12.valid, pnp12.n_inliers, 0)):3d} "
          f"self={int(jnp.where(pnp_self.valid, pnp_self.n_inliers, 0)):3d}"
          f"/{int(m2.sum()):3d} |xyz|=[{nz.min():.2f},{nz.max():.2f}]",
          flush=True)
