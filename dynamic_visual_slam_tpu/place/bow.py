"""Bag-of-binary-words place recognition — the DBoW2 component (C7).

The reference links DBoW2/DLib into the backend as "loop-closure ready"
(CMakeLists.txt:124-128) and exercises it in test_dbow2_integration.cpp:
load an ORB vocabulary, convert descriptors, add keyframes to a database,
query self-similarity, train a tiny vocabulary.  This module reproduces that
whole surface TPU-first:

- the hierarchical vocabulary lives as dense per-level center tables; the
  descriptor→word descent is a batched Hamming comparison per level
  (XOR+popcount as bf16 matmuls, ops/hamming.py) instead of per-descriptor
  pointer chasing;
- BoW vectors are dense (n_words,) L1-normalized tf-idf histograms built by
  segment-sum;
- database scoring  s(v,w) = 1 − ½‖v̂−ŵ‖₁ = Σᵢ min(v̂ᵢ, ŵᵢ)  (DBoW2's
  L1 score) is evaluated against every stored entry in one vectorized pass
  over the (capacity, n_words) matrix.

Vocabulary training is host-side binary k-medians (majority bit per
cluster) — the offline path, like DBoW2's create().  ORBvoc.txt loading is
supported for drop-in use of the pretrained ORB-SLAM vocabulary.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.ops import hamming


# ---------------------------------------------------------------------------
# Vocabulary
# ---------------------------------------------------------------------------

@dataclass
class Vocabulary:
    """Hierarchical binary vocabulary with dense level tables.

    levels[l]: (k^(l+1), 256) uint8 bit matrix of all nodes at depth l+1,
    laid out so node n's children occupy rows [n*k, (n+1)*k).  Missing
    children (unbalanced trees) are masked by `valid[l]`.
    """

    k: int
    depth: int
    levels: List[jnp.ndarray]
    valid: List[jnp.ndarray]
    word_weights: jnp.ndarray          # (n_words,) idf weights

    @property
    def n_words(self) -> int:
        return self.levels[-1].shape[0]

    def transform(self, desc_bits: jnp.ndarray, mask: jnp.ndarray
                  ) -> jnp.ndarray:
        """(N,256) descriptors → (n_words,) L1-normalized tf-idf BoW vector."""
        word = descend(self, desc_bits)
        tf = jnp.zeros(self.n_words, jnp.float32).at[word].add(
            mask.astype(jnp.float32))
        v = tf * self.word_weights
        n = jnp.sum(v)
        return v / jnp.where(n > 0, n, 1.0)


def descend(voc: Vocabulary, desc_bits: jnp.ndarray) -> jnp.ndarray:
    """(N,256) → (N,) word (leaf) indices: per level, compare each descriptor
    against its current node's k children and take the Hamming argmin."""
    n = desc_bits.shape[0]
    node = jnp.zeros(n, jnp.int32)
    for lvl, (centers, val) in enumerate(zip(voc.levels, voc.valid)):
        child_rows = node[:, None] * voc.k + jnp.arange(voc.k)[None, :]
        cand = centers[child_rows]                       # (N, k, 256)
        d = jnp.sum((cand != desc_bits[:, None, :]).astype(jnp.int32), axis=-1)
        d = jnp.where(val[child_rows], d, 1 << 20)
        best = jnp.argmin(d, axis=1).astype(jnp.int32)
        node = node * voc.k + best
    return node


def train_vocabulary(descs: np.ndarray, k: int = 10, depth: int = 3,
                     seed: int = 0, iters: int = 8,
                     doc_ids: np.ndarray = None) -> Vocabulary:
    """Host-side hierarchical binary k-medians (DBoW2 create() equivalent).

    descs: (N, 256) uint8 bits in {0,1}.
    doc_ids: optional (N,) document (keyframe) index per descriptor — enables
    DBoW2's TF_IDF weighting idf = log(n_docs / n_docs_containing_word);
    without it idf falls back to descriptor counts (less discriminative:
    per-image-common "stop words" keep large weights).
    """
    rng = np.random.default_rng(seed)
    descs = np.asarray(descs, np.uint8)

    def kmedians(data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        if len(data) == 0:
            return np.zeros((k, 256), np.uint8), np.zeros(k, bool)
        init = data[rng.choice(len(data), size=min(k, len(data)),
                               replace=False)]
        centers = np.zeros((k, 256), np.uint8)
        centers[:len(init)] = init
        alive = np.zeros(k, bool)
        alive[:len(init)] = True
        assign = np.zeros(len(data), np.int64)
        for _ in range(iters):
            d = (data[:, None, :] != centers[None, :, :]).sum(-1)
            d[:, ~alive] = 1 << 20
            assign = d.argmin(1)
            for c in range(k):
                sel = data[assign == c]
                if len(sel):
                    centers[c] = (sel.mean(0) >= 0.5).astype(np.uint8)
        return centers, alive

    levels: List[np.ndarray] = []
    valids: List[np.ndarray] = []
    groups = {0: np.arange(len(descs))}     # descriptor INDICES per node
    n_nodes = 1
    for lvl in range(depth):
        n_next = n_nodes * k
        centers = np.zeros((n_next, 256), np.uint8)
        valid = np.zeros(n_next, bool)
        next_groups = {}
        for node, idxs in groups.items():
            data = descs[idxs]
            c, alive = kmedians(data)
            centers[node * k:(node + 1) * k] = c
            valid[node * k:(node + 1) * k] = alive
            if len(data):
                d = (data[:, None, :] != c[None, :, :]).sum(-1)
                d[:, ~alive] = 1 << 20
                a = d.argmin(1)
                for ci in range(k):
                    next_groups[node * k + ci] = idxs[a == ci]
        levels.append(centers)
        valids.append(valid)
        groups = next_groups
        n_nodes = n_next

    # idf weights (DBoW2 TF_IDF): over DOCUMENTS when doc_ids given, else
    # over descriptors
    n_words = n_nodes
    counts = np.zeros(n_words)
    if doc_ids is not None:
        doc_ids = np.asarray(doc_ids)
        n_docs = max(len(np.unique(doc_ids)), 1)
        for node, idxs in groups.items():
            counts[node] = len(np.unique(doc_ids[idxs]))
    else:
        n_docs = max(len(descs), 1)
        for node, idxs in groups.items():
            counts[node] = len(idxs)
    idf = np.log(n_docs / np.maximum(counts, 1.0))
    idf[counts == 0] = 0.0
    # leaves of dead branches never win the argmin; weight 1 elsewhere keeps
    # plain-tf behavior when idf degenerates (tiny vocabularies)
    if not np.isfinite(idf).all() or idf.max() <= 0:
        idf = np.ones(n_words)
    return Vocabulary(
        k=k, depth=depth,
        levels=[jnp.asarray(l) for l in levels],
        valid=[jnp.asarray(v) for v in valids],
        word_weights=jnp.asarray(np.maximum(idf, 1e-3), jnp.float32))


def load_orbvoc_text(path: str) -> Vocabulary:
    """Load the pretrained ORB-SLAM ORBvoc.txt (k, L, scoring, weighting
    header; one node per line: parent is_leaf 32 byte-values weight)."""
    with open(path) as f:
        header = f.readline().split()
        k, depth = int(header[0]), int(header[1])
        nodes = []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parent = int(parts[0])
            bits = np.unpackbits(
                np.asarray([int(x) for x in parts[2:34]], np.uint8)[:, None],
                axis=1, bitorder="little").reshape(-1)
            weight = float(parts[34])
            nodes.append((parent, int(parts[1]), bits, weight))

    # rebuild dense level tables: children of node n at rows n*k..n*k+k-1
    levels = [np.zeros((k ** (l + 1), 256), np.uint8) for l in range(depth)]
    valids = [np.zeros(k ** (l + 1), bool) for l in range(depth)]
    weights = np.zeros(k ** depth, np.float32)
    # node ids in file order; parent=0 is root. Track (level, slot) per id.
    pos = {0: (-1, 0)}
    child_count = {0: 0}
    shallow_leaves = []
    for i, (parent, is_leaf, bits, w) in enumerate(nodes, start=1):
        pl, pslot = pos[parent]
        lvl = pl + 1
        slot = pslot * k + child_count.get(parent, 0)
        child_count[parent] = child_count.get(parent, 0) + 1
        child_count[i] = 0
        pos[i] = (lvl, slot)
        levels[lvl][slot] = bits
        valids[lvl][slot] = True
        if lvl == depth - 1:
            weights[slot] = w
        elif is_leaf:
            shallow_leaves.append((lvl, slot, bits, w))
    # DBoW2 vocabularies are unbalanced: leaves exist above the bottom level
    # (size-1 clusters stop splitting).  Propagate each shallow leaf down as
    # a single-child chain so descend() lands on a real weighted word instead
    # of walking an all-invalid branch.
    for lvl, slot, bits, w in shallow_leaves:
        s = slot
        for l2 in range(lvl + 1, depth):
            s = s * k
            levels[l2][s] = bits
            valids[l2][s] = True
        weights[s] = w
    return Vocabulary(k=k, depth=depth,
                      levels=[jnp.asarray(l) for l in levels],
                      valid=[jnp.asarray(v) for v in valids],
                      word_weights=jnp.asarray(np.maximum(weights, 1e-6)))


def save_vocabulary(voc: Vocabulary, path: str) -> None:
    """Persist a vocabulary as compressed npz — the rebuild's ORBvoc.txt
    equivalent (the reference ships DBoW2's pretrained text vocabulary in
    its package share dir, test_dbow2_integration.cpp:63-126; zero-egress
    environments train and ship their own instead, cli train-vocab)."""
    arrs = dict(k=np.asarray(voc.k), depth=np.asarray(voc.depth),
                word_weights=np.asarray(voc.word_weights))
    for l, (lv, va) in enumerate(zip(voc.levels, voc.valid)):
        arrs[f"level_{l}"] = np.packbits(np.asarray(lv, np.uint8), axis=1)
        arrs[f"valid_{l}"] = np.asarray(va)
    np.savez_compressed(path, **arrs)


def load_vocabulary(path: str) -> Vocabulary:
    """Load a save_vocabulary() npz."""
    data = np.load(path)
    depth = int(data["depth"])
    levels, valids = [], []
    for l in range(depth):
        bits = np.unpackbits(data[f"level_{l}"], axis=1, count=256)
        levels.append(jnp.asarray(bits))
        valids.append(jnp.asarray(data[f"valid_{l}"]))
    return Vocabulary(k=int(data["k"]), depth=depth, levels=levels,
                      valid=valids,
                      word_weights=jnp.asarray(data["word_weights"],
                                               jnp.float32))


# ---------------------------------------------------------------------------
# Database
# ---------------------------------------------------------------------------

def l1_score(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score between L1-normalized BoW vectors: Σ min(aᵢ, bᵢ)."""
    return jnp.sum(jnp.minimum(a, b), axis=-1)


class QueryResult(NamedTuple):
    entry_ids: jnp.ndarray   # (top_k,) int32
    scores: jnp.ndarray      # (top_k,)
    valid: jnp.ndarray       # (top_k,) bool


@dataclass
class Database:
    """Fixed-capacity BoW database (OrbDatabase add/query surface,
    test_dbow2_integration.cpp:103-125).

    The transform/add/score paths are JITTED (one compiled program per
    call instead of ~dozens of eagerly-dispatched ops — on a tunneled TPU
    the eager chain cost ~100x the device time and collapsed the shipped-
    defaults pipeline to single-digit FPS, BENCH r4 first run). The
    vocabulary's dense level tables are closed over as compile-time
    constants; per-(shape, top_k) executables cache on the instance."""

    vocabulary: Vocabulary
    capacity: int = 1024
    vectors: jnp.ndarray = None          # (capacity, n_words)
    used: jnp.ndarray = None             # (capacity,) bool
    count: int = 0

    def __post_init__(self):
        if self.vectors is None:
            self.vectors = jnp.zeros((self.capacity,
                                      self.vocabulary.n_words), jnp.float32)
            self.used = jnp.zeros(self.capacity, bool)
        voc = self.vocabulary
        self._transform_fn = jax.jit(
            lambda d, m: voc.transform(d, m))
        self._add_fn = jax.jit(
            lambda vec, used, v, slot: (vec.at[slot].set(v),
                                        used.at[slot].set(True)),
            donate_argnums=(0, 1))
        self._query_fns = {}

    def _query_fn(self, top_k: int):
        fn = self._query_fns.get(top_k)
        if fn is None:
            def q(vectors, used, v):
                scores = l1_score(vectors, v[None, :])
                scores = jnp.where(used, scores, -1.0)
                vals, idx = jax.lax.top_k(scores, top_k)
                return idx.astype(jnp.int32), vals
            fn = self._query_fns[top_k] = jax.jit(q)
        return fn

    def add(self, desc_bits: jnp.ndarray, mask: Optional[jnp.ndarray] = None
            ) -> int:
        """Add a keyframe's descriptors; returns its entry id."""
        if mask is None:
            mask = jnp.ones(desc_bits.shape[0], bool)
        v = self._transform_fn(desc_bits, mask)
        slot = self.count % self.capacity
        self.vectors, self.used = self._add_fn(
            self.vectors, self.used, v, jnp.asarray(slot, jnp.int32))
        self.count += 1
        return slot

    def query(self, desc_bits: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
              top_k: int = 5) -> QueryResult:
        if mask is None:
            mask = jnp.ones(desc_bits.shape[0], bool)
        v = self._transform_fn(desc_bits, mask)
        idx, vals = self._query_fn(top_k)(self.vectors, self.used, v)
        return QueryResult(idx, vals, vals >= 0)
