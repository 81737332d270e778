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


def _tune_allocator() -> None:
    """Keep large numpy buffers on the reusable glibc heap.

    Virtualized hosts (incl. this sandbox) can charge ~0.5 ms per first-touch
    page fault; with glibc's default 128 KiB mmap threshold every sizeable
    per-batch numpy temp is a fresh mmap that re-faults on every call —
    measured 26x slowdown on the signature kernels. Raising the mmap/trim
    thresholds makes malloc retain and reuse those pages. Runs once per
    process at package import, so every Ray worker gets it. No-op off glibc.
    """
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:  # pragma: no cover - non-glibc platforms
        pass


_tune_allocator()
