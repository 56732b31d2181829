"""Offline vocabulary pretraining — the rebuild's ORBvoc.txt factory.

The reference deploys DBoW2's pretrained ORB vocabulary, downloaded and
installed into the package share directory (test_dbow2_integration.cpp:63-126,
README.md:95-104).  Zero-egress environments cannot download it, so this
module trains one from first principles: many viewpoints of many synthetic
worlds → ORB descriptors from the SAME TPU extraction pipeline the system
runs online → hierarchical binary k-medians (place/bow.train_vocabulary)
with per-frame document ids for DBoW2's tf-idf weighting → a compressed
npz asset (place/bow.save_vocabulary) that `SLAMSystem(vocab_path=...)`
or `cli run --vocab ...` loads at startup, giving place recognition from
keyframe 0 with no online training delay.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from dynamic_visual_slam_tpu.config import CameraConfig, SLAMConfig
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.place import bow


def build_descriptor_corpus(n_scenes: int = 12, frames_per_scene: int = 24,
                            per_frame: int = 500, seed: int = 0,
                            camera: Optional[CameraConfig] = None,
                            verbose: bool = True
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Render `n_scenes` differently-seeded synthetic worlds from
    `frames_per_scene` viewpoints each and extract ORB descriptors with the
    production frontend (frontend/orb.py on the active JAX backend).

    Returns (descs (N,256) uint8 bits, doc_ids (N,)) — doc id = global
    frame index, so idf counts documents the DBoW2 way."""
    import jax
    import jax.numpy as jnp

    from dynamic_visual_slam_tpu.frontend import orb

    cfg = SLAMConfig()
    cam = camera or cfg.camera.scaled(424, 240)
    rng = np.random.default_rng(seed)
    extract = jax.jit(lambda g: orb.extract(g, cfg.orb))

    descs, doc_ids = [], []
    doc = 0
    for s in range(n_scenes):
        scene = synthetic.SyntheticScene(cam, seed=int(rng.integers(1 << 30)))
        poses = synthetic.orbit_trajectory(
            frames_per_scene, seed=int(rng.integers(1 << 30)))
        for r, t in poses:
            gray, _ = scene.render(r, t)
            kp = extract(jnp.asarray(gray))
            m = np.asarray(kp.mask)
            d = np.asarray(kp.desc_bits)[m]
            if len(d) > per_frame:
                d = d[rng.choice(len(d), per_frame, replace=False)]
            descs.append(d)
            doc_ids.append(np.full(len(d), doc))
            doc += 1
        if verbose:
            print(f"scene {s + 1}/{n_scenes}: "
                  f"{sum(len(d) for d in descs)} descriptors", flush=True)
    return np.concatenate(descs), np.concatenate(doc_ids)


def train_pretrained_vocabulary(out_path: str, k: int = 10, depth: int = 3,
                                n_scenes: int = 12,
                                frames_per_scene: int = 24,
                                per_frame: int = 500, seed: int = 0,
                                verbose: bool = True) -> dict:
    """Corpus → train → save → self-check.  Returns a report dict.

    The self-check mirrors the reference's DBoW2 integration test
    (add each scene's first frame to a database, query a DIFFERENT frame
    of the same scene, expect the own-scene entry to win)."""
    descs, doc_ids = build_descriptor_corpus(
        n_scenes, frames_per_scene, per_frame, seed, verbose=verbose)
    if verbose:
        print(f"training k={k} depth={depth} vocabulary on "
              f"{len(descs)} descriptors ...", flush=True)
    voc = bow.train_vocabulary(descs, k=k, depth=depth, seed=seed,
                               doc_ids=doc_ids)
    bow.save_vocabulary(voc, out_path)

    # self-check: scene discrimination with the saved vocabulary
    import jax.numpy as jnp
    voc2 = bow.load_vocabulary(out_path if out_path.endswith(".npz")
                               else out_path + ".npz")
    db = bow.Database(voc2, capacity=64)
    # one DB entry per scene (its first frame), one query per scene (its
    # last frame). Doc ids ARE global frame indices (build_descriptor_corpus
    # increments `doc` unconditionally), so index scenes directly — a frame
    # that produced zero descriptors simply has no rows, it must not shift
    # every later scene's index the way np.unique(doc_ids) would.
    fps = frames_per_scene
    correct = 0
    for s in range(n_scenes):
        d_first = descs[doc_ids == s * fps]
        db.add(jnp.asarray(d_first if len(d_first) else descs[:1]))
    for s in range(n_scenes):
        d_last = descs[doc_ids == s * fps + fps - 1]
        if not len(d_last):
            continue          # degenerate frame: counts as a retrieval miss
        res = db.query(jnp.asarray(d_last), top_k=1)
        if bool(res.valid[0]) and int(res.entry_ids[0]) == s:
            correct += 1
    report = dict(path=out_path, n_descriptors=int(len(descs)),
                  n_documents=int(np.unique(doc_ids).size), k=k, depth=depth,
                  n_words=int(voc.n_words),
                  scene_retrieval_accuracy=round(correct / n_scenes, 4))
    if verbose:
        print(report, flush=True)
    return report
