"""text_dedup_ray — a Ray-Data-native near-duplicate detection engine.

A from-scratch rewrite of the capabilities of ChenghaoMou/text-dedup
(reference at /root/reference) on top of ``ray.data.Dataset`` pipelines:

- MinHashLSH  (shingle -> minhash signature -> banded LSH buckets -> CC)
- SimHash     (shingle -> f-bit bit-majority fingerprint -> block-permutation
               prefix buckets -> Hamming verify -> CC)
- Exact dedup (content-hash groupby; replaces the reference's Bloom filter
               with exact first-occurrence-wins semantics)
- Suffix-array exact-substring dedup (per-partition suffix arrays)

plus the extra operators a large-scale training-data pipeline needs:
language id, quality scoring, token counting, document fingerprinting,
embedding ANN search, and image (binary payload) plumbing.

Everything is expressed as streaming ``ray.data.Dataset`` transforms:
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, explicit ``groupby`` shuffles for the wide steps, and a
tree-reduced union-find for connected components.
"""

__version__ = "0.1.0"
