"""Binary BoW vocabulary: hierarchical k-means tree over ORB descriptors.

Replaces DBoW2's ``TemplatedVocabulary<FORB>`` (ORBVocabulary.h:25-31,
SURVEY §2.2): a branching-factor-k, depth-L tree of binary centroids with
tf-idf weighting and L1 scoring, the 4-levels-up feature grouping used for
matching (Frame.cc:575 ``transform(..., 4)``), and a loader for the
reference's ORBvoc.txt format.

Training (host, offline) is binary k-means with majority-vote centroids.
The per-frame transform is batched and jittable: descriptors descend the
tree level-by-level as gather + XOR-popcount argmin steps — one [N, k]
popcount per level instead of DBoW2's per-descriptor pointer chase.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class Vocabulary(NamedTuple):
    """Flat-array vocabulary tree.

    Nodes are stored in breadth-first order; node 0 is the root (its
    descriptor is unused).  ``children[i]`` lists up to k child node ids
    (-1 padded).  Leaves carry word ids; internal nodes -1.
    """
    node_desc: np.ndarray       # [n_nodes, 32] uint8
    children: np.ndarray        # [n_nodes, k] int32
    word_id: np.ndarray         # [n_nodes] int32 (-1 internal)
    word_weight: np.ndarray     # [n_words] float32 (idf)
    node_level: np.ndarray      # [n_nodes] int32
    depth: int
    branching: int

    @property
    def n_words(self) -> int:
        return len(self.word_weight)


def _unpack(desc_u8: np.ndarray) -> np.ndarray:
    return np.unpackbits(desc_u8, axis=1, bitorder="little")


def _majority_center(bits: np.ndarray) -> np.ndarray:
    """[M, 256] bits -> [32] uint8 majority-vote centroid."""
    maj = (bits.mean(0) >= 0.5).astype(np.uint8)
    return np.packbits(maj, bitorder="little")


def train(descriptors: np.ndarray, branching: int = 10, depth: int = 6,
          seed: int = 0, max_iters: int = 8) -> Vocabulary:
    """Train the tree on [N, 32] uint8 descriptors (k-majority clustering)."""
    rng = np.random.RandomState(seed)
    bits_all = _unpack(descriptors)

    node_desc = [np.zeros(32, np.uint8)]
    children: list = [[]]
    node_level = [0]
    parent_of: list = [-1]

    def cluster(idx: np.ndarray, level: int, parent: int):
        bits = bits_all[idx]
        if level == depth or len(idx) <= branching:
            # children become leaves directly (one per remaining cluster) —
            # handled by making this node a leaf instead.
            return
        k = min(branching, len(idx))
        # k-means++-ish init: random distinct picks.
        picks = rng.choice(len(idx), k, replace=False)
        centers = bits[picks].astype(np.float32)
        assign = None
        for _ in range(max_iters):
            d = (bits[:, None, :] != (centers[None] >= 0.5)).sum(-1)
            new_assign = d.argmin(1)
            if assign is not None and (new_assign == assign).all():
                break
            assign = new_assign
            for c in range(k):
                sel = assign == c
                if sel.any():
                    centers[c] = bits[sel].mean(0)
        for c in range(k):
            sel = assign == c
            if not sel.any():
                continue
            node_id = len(node_desc)
            node_desc.append(_majority_center(bits[sel]))
            children.append([])
            node_level.append(level + 1)
            parent_of.append(parent)
            children[parent].append(node_id)
            cluster(idx[sel], level + 1, node_id)

    cluster(np.arange(len(descriptors)), 0, 0)

    n_nodes = len(node_desc)
    child_arr = np.full((n_nodes, branching), -1, np.int32)
    for i, ch in enumerate(children):
        child_arr[i, :len(ch)] = ch
    word_id = np.full(n_nodes, -1, np.int32)
    leaves = [i for i in range(n_nodes) if not children[i] and i != 0]
    for w, i in enumerate(leaves):
        word_id[i] = w

    # idf weights from the training set (DBoW2 TF_IDF: log(N_docs / N_i);
    # with one big training "document" per descriptor this degenerates, so
    # use descriptor counts as the frequency proxy).
    voc = Vocabulary(np.asarray(node_desc), child_arr, word_id,
                     np.ones(len(leaves), np.float32),
                     np.asarray(node_level, np.int32), depth, branching)
    words, _ = transform_host(voc, descriptors)
    counts = np.bincount(words[words >= 0], minlength=len(leaves)) + 1
    idf = np.log(len(descriptors) / counts).astype(np.float32)
    idf = np.maximum(idf, 1e-3)
    return voc._replace(word_weight=idf)


def transform_host(voc: Vocabulary, descriptors: np.ndarray,
                   group_up_levels: int = 4
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Host (numpy) descent — used during training and as a jnp oracle.

    Returns (word ids [N], group-node ids [N] at depth-``group_up_levels``).
    """
    bits = _unpack(descriptors)
    node_bits = _unpack(voc.node_desc)
    n = len(descriptors)
    cur = np.zeros(n, np.int32)
    group = np.zeros(n, np.int32)
    group_level = max(voc.depth - group_up_levels, 1)
    for level in range(voc.depth):
        ch = voc.children[cur]                       # [N, k]
        has_child = (ch >= 0).any(1)
        cb = node_bits[np.clip(ch, 0, None)]         # [N, k, 256]
        d = (bits[:, None, :] != cb).sum(-1)
        d = np.where(ch >= 0, d, 1 << 30)
        nxt = np.take_along_axis(ch, d.argmin(1)[:, None], 1)[:, 0]
        cur = np.where(has_child, nxt, cur).astype(np.int32)
        if level + 1 == group_level:
            group = cur.copy()
    return voc.word_id[cur], group


def transform(voc: Vocabulary, desc_u8, valid, group_up_levels: int = 4):
    """Jittable batched descent.

    Args:
      desc_u8: [N, 32] uint8.
      valid: [N] bool.
    Returns (word ids [N] int32 (-1 invalid), group ids [N], tf-idf BoW
    vector [n_words] float32, L1-normalized).
    """
    words, group, _ = _descend(voc, desc_u8, valid, group_up_levels)
    weights = jnp.asarray(voc.word_weight)
    bow = jnp.zeros(voc.n_words).at[jnp.clip(words, 0)].add(
        jnp.where(valid & (words >= 0), weights[jnp.clip(words, 0)], 0.0))
    norm = jnp.maximum(jnp.sum(jnp.abs(bow)), 1e-9)
    return words, group, bow / norm


def transform_words(voc: Vocabulary, desc_u8, valid, group_up_levels: int = 4):
    """Jittable descent returning (word ids [N], group ids [N]) only — no
    dense BoW vector.  The production path stores SPARSE tf-idf rows
    (slam.keyframe_db), so materializing an O(n_words) vector per keyframe
    would waste a 4 MB device scatter per insertion at 10^6 words."""
    words, groups, _ = _descend(voc, desc_u8, valid, group_up_levels)
    return words, groups


def _descend(voc: Vocabulary, desc_u8, valid, group_up_levels: int):
    from ..ops import brief
    bits = brief.unpack_bits(desc_u8)                # [N, 256]
    node_bits = jnp.asarray(_unpack(voc.node_desc))  # [n_nodes, 256]
    children = jnp.asarray(voc.children)
    word_id = jnp.asarray(voc.word_id)

    n = desc_u8.shape[0]
    cur = jnp.zeros(n, jnp.int32)
    group = jnp.zeros(n, jnp.int32)
    group_level = max(voc.depth - group_up_levels, 1)
    for level in range(voc.depth):
        ch = children[cur]                           # [N, k]
        cb = node_bits[jnp.clip(ch, 0)]              # [N, k, 256]
        d = jnp.sum(bits[:, None, :] != cb, axis=-1)
        d = jnp.where(ch >= 0, d, 1 << 30)
        nxt = jnp.take_along_axis(ch, jnp.argmin(d, 1)[:, None], 1)[:, 0]
        has_child = (ch >= 0).any(1)
        cur = jnp.where(has_child, nxt, cur)
        if level + 1 == group_level:
            group = cur
    words = jnp.where(valid, word_id[cur], -1)
    return words, jnp.where(valid, group, -1), cur


def l1_score(bow_a, bow_b):
    """DBoW2 L1 similarity: 1 - 0.5 * |va - vb|_1 on L1-normalized vectors
    (the metric behind min-score gating, LoopClosing.cc:135)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(bow_a - bow_b), axis=-1)


def load_orbvoc_text(path: str) -> Vocabulary:
    """Load the reference's ORBvoc.txt (DBoW2 text format).

    Format (TemplatedVocabulary::saveToTextFile): a header line
    ``k L scoring weighting`` followed by one line per node *excluding the
    root*: ``parent is_leaf d0 .. d31 weight``.  Node ids are implicit: the
    root is node 0 and the i-th data line (1-based) is node i.  ``parent``
    is the final node id of the parent (root = 0) — NOT offset; the loader
    round-trips against :func:`save_orbvoc_text` in
    tests/test_vocabulary.py.  Word ids are assigned to leaves in file
    order, matching TemplatedVocabulary::createWords' node-id order.
    """
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        rows = []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parent = int(parts[0])
            is_leaf = int(parts[1])
            desc = np.asarray([int(x) for x in parts[2:34]], np.uint8)
            weight = float(parts[34])
            rows.append((parent, is_leaf, desc, weight))

    n_nodes = len(rows) + 1
    node_desc = np.zeros((n_nodes, 32), np.uint8)
    children = np.full((n_nodes, k), -1, np.int32)
    word_id = np.full(n_nodes, -1, np.int32)
    node_level = np.zeros(n_nodes, np.int32)
    weights = []
    child_count = np.zeros(n_nodes, np.int32)
    for i, (parent, is_leaf, desc, weight) in enumerate(rows, start=1):
        node_desc[i] = desc
        p = parent  # parent ids are final node ids, root = 0 (DBoW2 text)
        if 0 <= p < n_nodes and child_count[p] < k:
            children[p, child_count[p]] = i
            child_count[p] += 1
            node_level[i] = node_level[p] + 1
        if is_leaf:
            word_id[i] = len(weights)
            weights.append(weight)
    return Vocabulary(node_desc, children, word_id,
                      np.asarray(weights, np.float32), node_level, L, k)


def save_orbvoc_text(path: str, voc: Vocabulary) -> None:
    """Write a vocabulary in DBoW2's ORBvoc.txt text format (the exact
    inverse of :func:`load_orbvoc_text`; used for the round-trip test and
    for interop with reference tooling).

    Requires nodes to be stored parent-before-child (true for trees built
    by :func:`train` and :func:`load_orbvoc_text`).
    """
    n_nodes = len(voc.node_desc)
    parent = np.zeros(n_nodes, np.int64)
    for p in range(n_nodes):
        for c in voc.children[p]:
            if c >= 0:
                parent[c] = p
    with open(path, "w") as f:
        f.write(f"{voc.branching} {voc.depth} 0 0\n")
        for i in range(1, n_nodes):
            is_leaf = int(voc.word_id[i] >= 0)
            w = float(voc.word_weight[voc.word_id[i]]) if is_leaf else 0.0
            desc = " ".join(str(int(b)) for b in voc.node_desc[i])
            f.write(f"{parent[i]} {is_leaf} {desc} {w}\n")


def save(path: str, voc: Vocabulary) -> None:
    """Persist a vocabulary as .npz (fast to reload vs the ~100 MB
    ORBvoc.txt parse the reference pays at every startup, System.cc:71-78)."""
    np.savez_compressed(
        path, node_desc=voc.node_desc, children=voc.children,
        word_id=voc.word_id, word_weight=voc.word_weight,
        node_level=voc.node_level,
        meta=np.asarray([voc.depth, voc.branching], np.int32))


def load(path: str) -> Vocabulary:
    z = np.load(path)
    return Vocabulary(z["node_desc"], z["children"], z["word_id"],
                      z["word_weight"], z["node_level"],
                      int(z["meta"][0]), int(z["meta"][1]))
