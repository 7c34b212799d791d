"""NumPy oracle for the reference's top-k evaluation protocol.

This module is the *specification*: it reproduces the counting semantics of
the reference CLI bit-for-bit (reference evaluate.py:81-112) and of the
library twin (reference utils.py:101-127), and the device evaluator in
``eval/device.py`` is tested against it.

Protocol (accuracy@step..total, ref evaluate.py:94-112):
  for each test user with >=1 liked test item:
    walk candidate items in descending score order;
    skip items the user browsed in training (``seen``);
    for the t-th *unseen* candidate (t = 0,1,...): if it is liked, add a hit
    to every bucket >= t//step; stop after ``total`` unseen candidates.
  accuracy@(step*(j+1)) = sum(hits in bucket j) / sum(len(likes)).

So accuracy@k is recall@k computed over previously-unseen ranked candidates,
truncated at ``total``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence

import numpy as np


@dataclass
class EvalResult:
    hits: np.ndarray      # float [interval] summed hit counts per bucket
    rr: np.ndarray        # float [interval] summed reciprocal ranks per bucket
    count: int            # total number of liked test items (denominator)

    @property
    def accuracy(self) -> np.ndarray:
        if self.count == 0:
            return np.zeros_like(self.hits)
        return self.hits / self.count


def evaluate_oracle(
    scores: np.ndarray,
    seen: np.ndarray,
    likes: Dict[int, Sequence[int]],
    step: int = 5,
    total: int = 30,
) -> EvalResult:
    """Reference-exact evaluation.

    Args:
      scores: [n_users, n_cand] score matrix over the candidate subset.
      seen:   [n_users, n_cand] bool — candidate was browsed in training
              (ref evaluate.py:98 ``teivt[liid] not in rated[uid]`` inverted).
      likes:  user index -> candidate indices liked in the test fold
              (ref evaluate.py:89-93). Users absent from ``likes`` or with
              empty like lists are skipped (ref evaluate.py:94).
      step, total: bucket width and unseen-rank cutoff (ref evaluate.py:52-53).

    Returns summed hits / reciprocal-ranks per bucket and the denominator.

    Bucketing semantics differ between the reference's two evaluators and
    we match each where it is defined: hits bucket by rank-among-UNSEEN
    (``idx//step`` — the CLI contract, ref evaluate.py:100, which this
    framework is byte-compared against), while the reciprocal-rank variant
    exists only in the library twin and buckets by RAW rank with raw-rank
    values (``j = t//step``, ``1/(t+1)`` — ref utils.py:116-119; buckets
    past ``interval`` are dropped there, so they are here too).
    """
    interval = total // step
    n_cand = scores.shape[1]
    hits = np.zeros(interval, dtype=np.float64)
    rrs = np.zeros(interval, dtype=np.float64)
    count = 0
    ranks = np.argsort(scores, axis=1)
    for u, like_list in likes.items():
        like_set = set(int(x) for x in like_list)
        if not like_set:
            continue
        idx = 0
        uhit = np.zeros(interval)
        urr = np.zeros(interval)
        for t in range(n_cand):
            cand = ranks[u, n_cand - 1 - t]
            if not seen[u, cand]:
                if cand in like_set:
                    uhit[idx // step :] += 1
                    jr = t // step
                    if jr < interval:
                        urr[jr:] += 1.0 / (t + 1)
                idx += 1
            if idx == total:
                break
        hits += uhit
        rrs += urr
        count += len(like_set)
    return EvalResult(hits=hits, rr=rrs, count=count)


def load_test_likes(
    test_file: str,
    uids: Dict[str, int],
    cand_ids: Dict[str, int],
) -> Dict[int, List[int]]:
    """Parse a test fold file into user -> liked-candidate-index lists.

    Ref evaluate.py:84-93: likes are entries with like==1 whose item appears
    in the scenario's candidate id list.
    """
    likes: Dict[int, List[int]] = {}
    with open(test_file, "r") as f:
        for line in f:
            terms = line.strip().split(",")
            uid = terms[0]
            if uid not in uids:
                continue
            cur: List[int] = []
            for term in terms[1:]:
                iid, _, like = term.partition(":")
                if like == "1" and iid in cand_ids:
                    cur.append(cand_ids[iid])
            likes[uids[uid]] = cur
    return likes
