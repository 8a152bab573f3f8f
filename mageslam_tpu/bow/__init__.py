"""Place recognition: bag-of-binary-words as dense batched linear algebra.

Replaces BoW/OnlineBow.{h,cpp} (734 LoC): the reference trains a 2-level
branching-6 vocabulary tree (36 leaves) online by Hamming k-medoid over the
first ~15 frames' descriptors (OnlineBow.cpp:454-587), assigns every keyframe
a tf-idf L1-normalized leaf histogram, and scores query images by an
intersection-only L1 similarity (QueryUnknownImage, OnlineBow.cpp:153-260).

TPU-first redesign:
  - the tree becomes a FLAT vocabulary of V anchor descriptors; word
    assignment is one (N, V) Hamming matrix argmin (MXU bit-matmul) — the
    tree only existed to prune CPU comparisons;
  - the reference's per-node score value Σ_{i∈both}(|q−k|−|q|−|k|) with
    score = −value/2 reduces algebraically to Σ_i min(q_i, k_i), so scoring
    every keyframe at once is a (K, V) min + row-sum;
  - online training is a batched k-medoid (fixed iterations) over the same
    first-frames descriptor pool;
  - the direct index (per-node feature lists accelerating IndexedMatch) is
    unnecessary: dense 512×512 Hamming matrices are trivial on the MXU
    (SURVEY §7.1 step 8), so IndexedMatch == masked dense match.
"""

from .index import (  # noqa: F401
    BowIndex,
    add_keyframe,
    compute_idf,
    empty_index,
    query_keyframes,
)
from .vocab import train_vocabulary  # noqa: F401
