"""Keyframe database: BoW inverted file + loop / relocalization retrieval.

Replaces `KeyFrameDatabase` (KeyFrameDatabase.cc:33-309, SURVEY §2.1): the
inverted file ``word -> keyframes`` plus the two retrieval procedures —
``DetectLoopCandidates`` (shared-word counting, >= 0.8x max-common-words
gate, covisibility-group score accumulation, 0.75x best retention) and
``DetectRelocalizationCandidates`` (same without the min-score floor).

Host-side: the structure is a dense [K, n_words] sparse-ish boolean
storage via per-KF word-id arrays; the shared-word count across all KFs is
one vectorized bincount-style pass — no per-word list walking.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from .map import MapArena
from .vocabulary import Vocabulary


class KeyFrameDatabase:
    def __init__(self, voc: Vocabulary, arena: MapArena, max_kf: int):
        self.voc = voc
        self.map = arena
        # word ids per keyframe slot ([K, N] int32, -1 invalid).
        self.kf_words = np.full((max_kf, arena.kf_uv.shape[1]), -1, np.int32)
        # L1-normalized tf-idf BoW vectors per KF.
        self.kf_bow = np.zeros((max_kf, voc.n_words), np.float32)
        # group-node ids per keyframe slot (feature grouping for matching).
        self.kf_groups = np.full((max_kf, arena.kf_uv.shape[1]), -1, np.int32)
        self.registered = np.zeros(max_kf, bool)

    def add(self, kf_id: int, words: np.ndarray, groups: np.ndarray,
            bow: np.ndarray) -> None:
        self.kf_words[kf_id] = words
        self.kf_groups[kf_id] = groups
        self.kf_bow[kf_id] = bow
        self.registered[kf_id] = True

    def erase(self, kf_id: int) -> None:
        self.registered[kf_id] = False

    # ------------------------------------------------------------------ #

    def _shared_words(self, words: np.ndarray, exclude) -> np.ndarray:
        """Count shared words between a query word set and every registered
        KF ([K] int32)."""
        present = np.zeros(self.voc.n_words + 1, bool)
        present[words[words >= 0]] = True
        kw = self.kf_words
        shared = (present[np.clip(kw, 0, None)] & (kw >= 0)).sum(1)
        shared[~self.registered] = 0
        if exclude is not None:
            shared[list(exclude)] = 0
        return shared

    def detect_loop_candidates(self, kf_id: int, min_score: float,
                               max_candidates: int = 10) -> np.ndarray:
        """DetectLoopCandidates (KeyFrameDatabase.cc:76-197): exclude the
        covisibility neighborhood, gate by shared words and min_score, rank
        by covisibility-accumulated score, keep >= 0.75x best."""
        connected = set(int(k) for k in
                        self.map.covisible_keyframes(kf_id, min_weight=1))
        connected.add(kf_id)
        shared = self._shared_words(self.kf_words[kf_id], connected)
        if shared.max(initial=0) == 0:
            return np.zeros(0, np.int64)
        min_common = int(0.8 * shared.max())
        cands = np.nonzero(shared > max(min_common, 0))[0]

        q = self.kf_bow[kf_id]
        scores = 1.0 - 0.5 * np.abs(q[None] - self.kf_bow[cands]).sum(1)
        keep = scores >= min_score
        cands, scores = cands[keep], scores[keep]
        if len(cands) == 0:
            return np.zeros(0, np.int64)

        # Covisibility-accumulated score (each candidate + its top-10 covis
        # group; best single KF of the best groups is returned).
        acc = []
        for c, s in zip(cands, scores):
            group = self.map.best_covisible(int(c), 10)
            group_scores = [s]
            for g in group:
                if self.registered[g] and shared[g] > min_common:
                    gs = 1.0 - 0.5 * np.abs(q - self.kf_bow[g]).sum()
                    group_scores.append(gs)
            acc.append((sum(group_scores), float(max(group_scores)), int(c)))
        best_acc = max(a for a, _, _ in acc)
        out = [(bs, c) for a, bs, c in acc if a >= 0.75 * best_acc]
        out.sort(reverse=True)
        return np.asarray([c for _, c in out[:max_candidates]], np.int64)

    def detect_relocalization_candidates(self, words: np.ndarray,
                                         bow: np.ndarray,
                                         max_candidates: int = 5
                                         ) -> np.ndarray:
        """DetectRelocalizationCandidates (KeyFrameDatabase.cc:199-309) —
        same covisibility-group accumulation scheme as loop detection but
        with no min-score floor and no exclusion set: each candidate's score
        is accumulated over its top-10 covisible neighbors that also share
        enough words; groups with accumulated score >= 0.75x the best group
        survive, and each surviving group contributes its best single KF."""
        shared = self._shared_words(words, None)
        if shared.max(initial=0) == 0:
            return np.zeros(0, np.int64)
        min_common = int(0.8 * shared.max())
        cands = np.nonzero(shared > max(min_common, 0))[0]
        scores = 1.0 - 0.5 * np.abs(bow[None] - self.kf_bow[cands]).sum(1)
        if len(cands) == 0:
            return np.zeros(0, np.int64)

        score_of = dict(zip(cands.tolist(), scores.tolist()))
        acc = []  # (acc_score, best_kf_score, best_kf)
        for c, s in zip(cands, scores):
            total, best_s, best_kf = float(s), float(s), int(c)
            for g in self.map.best_covisible(int(c), 10):
                if not (self.registered[g] and shared[g] > min_common):
                    continue
                gs = score_of.get(int(g))
                if gs is None:
                    gs = float(1.0 - 0.5 * np.abs(bow - self.kf_bow[g]).sum())
                total += gs
                if gs > best_s:
                    best_s, best_kf = gs, int(g)
            acc.append((total, best_s, best_kf))
        best_acc = max(a for a, _, _ in acc)
        out = sorted({(bs, kf) for a, bs, kf in acc if a >= 0.75 * best_acc},
                     reverse=True)
        return np.asarray([kf for _, kf in out[:max_candidates]], np.int64)
