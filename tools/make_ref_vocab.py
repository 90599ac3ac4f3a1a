"""Train a DBoW2-text-format ORB vocabulary from a TUM-layout dataset.

The reference loads `ORBvoc.txt` at startup (src/System.cc:79-87); the 1M-word
blob is stripped from this mirror (.MISSING_LARGE_BLOBS), so for the measured
baseline we train a small vocabulary on the benchmark sequence itself using
OpenCV ORB descriptors + hierarchical k-medians, and emit the text format
parsed by TemplatedVocabulary::loadFromTextFile
(Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1339-1421):

  line 0: "k L scoring weighting"            (L1_NORM=0, TF_IDF=0)
  node lines (BFS order): "parent is_leaf d0..d31 weight"

Usage: python tools/make_ref_vocab.py DATASET_DIR OUT.txt [k] [L]
"""

import os
import sys

import numpy as np


def hamming_pop(a, b):
    """Pairwise Hamming distance between uint8 [N, 32] and [M, 32]."""
    x = a[:, None, :] ^ b[None, :, :]
    return np.unpackbits(x, axis=-1).sum(-1)


def kmedians_binary(desc, k, rng, iters=6):
    """Binary k-medians (bitwise majority centroid), returns [k, 32] uint8."""
    n = desc.shape[0]
    if n <= k:
        out = np.zeros((k, 32), np.uint8)
        out[:n] = desc
        return out, np.arange(n) % k
    centers = desc[rng.choice(n, k, replace=False)]
    assign = np.zeros(n, np.int64)
    for _ in range(iters):
        d = hamming_pop(desc, centers)
        assign = d.argmin(1)
        for c in range(k):
            sel = desc[assign == c]
            if len(sel) == 0:
                centers[c] = desc[rng.randint(n)]
                continue
            bits = np.unpackbits(sel, axis=-1)
            maj = (bits.mean(0) >= 0.5).astype(np.uint8)
            centers[c] = np.packbits(maj)
    return centers, assign


def main():
    import cv2

    dataset = sys.argv[1]
    out = sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    L = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    orb = cv2.ORB_create(nfeatures=1000)
    descs = []
    for sub in ("rgb", "rgb2"):
        d = os.path.join(dataset, sub)
        names = sorted(os.listdir(d))[::2]
        for nm in names:
            img = cv2.imread(os.path.join(d, nm), cv2.IMREAD_GRAYSCALE)
            _, dsc = orb.detectAndCompute(img, None)
            if dsc is not None:
                descs.append(dsc)
    desc = np.concatenate(descs, 0).astype(np.uint8)
    print(f"training on {desc.shape[0]} descriptors, k={k} L={L}")

    rng = np.random.RandomState(0)
    lines = []

    def build(node_descs, parent, level):
        """Recursively cluster; append node lines; return nothing."""
        centers, assign = kmedians_binary(node_descs, k, rng)
        ids = []
        for c in range(k):
            is_leaf = 1 if level == L else 0
            dstr = " ".join(str(int(v)) for v in centers[c])
            lines.append((parent, is_leaf, dstr))
            ids.append(len(lines))  # node id = line index + 1 (root is 0)
        if level < L:
            for c in range(k):
                sel = node_descs[assign == c]
                if len(sel) == 0:
                    sel = node_descs[rng.randint(len(node_descs), size=2)]
                build(sel, ids[c], level + 1)

    build(desc, 0, 1)
    with open(out, "w") as f:
        f.write(f"{k} {L} 0 0\n")
        for parent, is_leaf, dstr in lines:
            f.write(f"{parent} {is_leaf} {dstr} 1.0\n")
    print(f"wrote {len(lines)} nodes to {out}")


if __name__ == "__main__":
    main()
