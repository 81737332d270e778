"""Cross-partition exact-substring dedup: global variant must find runs the
partition-local pass misses, matching a single-partition (corpus-wide) run."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from text_dedup_ray.functions.suffixarray import minimizer_hashes
from text_dedup_ray.pipelines.suffix_array import (
    suffix_array_dedup,
    suffix_array_dedup_global,
)


def _corpus():
    rng = np.random.RandomState(4)
    vocab = ["w%03d" % i for i in range(300)]

    def rand_text(n):
        return " ".join(vocab[j] for j in rng.randint(0, 300, n))

    # non-self-repeating ~250-byte shared run (a repeating pattern would be
    # cut as an INTERNAL duplicate by the per-doc suffix array)
    shared = "sharedrun " + " ".join("q%03d" % i for i in rng.permutation(48))
    rows = []
    # pairs sharing the run, placed far apart so repartition splits them
    rows.append("A0 " + rand_text(20) + " " + shared + rand_text(10))
    rows += [rand_text(40) for _ in range(30)]
    rows.append("B0 " + rand_text(15) + " " + shared + " tail " + rand_text(12))
    rows += [rand_text(40) for _ in range(30)]
    # a doc with an INTERNAL repeat (must be cut even as a singleton)
    internal = rand_text(10) + " " + ("self repeating block here " * 10) + rand_text(10)
    rows.append(internal)
    return rows


class TestMinimizers:
    def test_shared_run_shares_anchor(self):
        shared = b"x" * 50 + bytes(range(200)) + b"y" * 50
        a = b"AAAA" + shared + b"BB"
        b = b"CCCCCCC" + shared + b"DDDD"  # different alignment
        ha = minimizer_hashes(np.frombuffer(a, dtype=np.uint8), length_threshold=100)
        hb = minimizer_hashes(np.frombuffer(b, dtype=np.uint8), length_threshold=100)
        assert set(ha.tolist()) & set(hb.tolist())

    def test_short_doc_no_anchors(self):
        assert len(minimizer_hashes(np.frombuffer(b"tiny", dtype=np.uint8))) == 0


class TestGlobalSuffixDedup:
    def test_matches_single_partition_oracle(self):
        rows = _corpus()
        ids = list(range(len(rows)))
        t = pa.table({"row_id": pa.array(ids, pa.int64()), "text": pa.array(rows)})

        # oracle: the whole corpus as ONE partition (reference semantics)
        oracle = (
            suffix_array_dedup(
                ray.data.from_arrow(t).repartition(1), length_threshold=100
            )
            .to_pandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        # global variant over 8 partitions
        got = (
            suffix_array_dedup_global(
                ray.data.from_arrow(t).repartition(8), length_threshold=100,
                num_partitions=8,
            )
            .to_pandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        assert got["row_id"].tolist() == oracle["row_id"].tolist()
        assert got["text"].tolist() == oracle["text"].tolist()

    def test_local_pass_misses_what_global_finds(self):
        rows = _corpus()
        t = pa.table(
            {"row_id": pa.array(range(len(rows)), pa.int64()), "text": pa.array(rows)}
        )
        local = suffix_array_dedup(
            ray.data.from_arrow(t).repartition(8), length_threshold=100
        ).to_pandas()
        global_ = suffix_array_dedup_global(
            ray.data.from_arrow(t).repartition(8), length_threshold=100, num_partitions=8
        ).to_pandas()
        # the shared run survives the local pass (docs in different blocks)
        # but is cut by the global pass
        local_a = local[local.row_id == 0]["text"].iloc[0]
        global_a = global_[global_.row_id == 0]["text"].iloc[0]
        assert "sharedrun" in local_a
        assert "sharedrun" not in global_a

    def test_internal_repeat_cut_in_singleton(self):
        rows = _corpus()
        t = pa.table(
            {"row_id": pa.array(range(len(rows)), pa.int64()), "text": pa.array(rows)}
        )
        out = suffix_array_dedup_global(
            ray.data.from_arrow(t).repartition(4), length_threshold=100, num_partitions=4
        ).to_pandas()
        internal_id = len(rows) - 1
        txt = out[out.row_id == internal_id]["text"].iloc[0]
        assert txt.count("self repeating block here") <= 1

    def test_forced_distributed_group_map_matches_driver(self):
        """driver_threshold=0 routes the co-processing group map through
        distributed CC + sharded tag lookup; output must match the driver
        dict path exactly (VERDICT r2 #2)."""
        rows = _corpus()
        t = pa.table(
            {"row_id": pa.array(range(len(rows)), pa.int64()), "text": pa.array(rows)}
        )
        driver = (
            suffix_array_dedup_global(
                ray.data.from_arrow(t).repartition(8), length_threshold=100,
                num_partitions=8,
            ).to_pandas().sort_values("row_id").reset_index(drop=True)
        )
        dist = (
            suffix_array_dedup_global(
                ray.data.from_arrow(t).repartition(8), length_threshold=100,
                num_partitions=8, driver_threshold=0,
            ).to_pandas().sort_values("row_id").reset_index(drop=True)
        )
        assert dist["row_id"].tolist() == driver["row_id"].tolist()
        assert dist["text"].tolist() == driver["text"].tolist()


class TestHubRoutedBoilerplate:
    def test_over_cap_boilerplate_still_cut(self):
        """A boilerplate run shared by MORE docs than max_bucket used to be
        silently dropped from cross-partition dedup; the hub-replication
        path must cut it from every doc."""
        rng = np.random.RandomState(7)
        vocab = ["w%03d" % i for i in range(300)]

        def rand_text(n):
            return " ".join(vocab[j] for j in rng.randint(0, 300, n))

        boiler = "BOILER " + " ".join("b%03d" % i for i in rng.permutation(48))
        n_docs = 40
        rows = [rand_text(10) + " " + boiler + " " + rand_text(8) for _ in range(n_docs)]
        t = pa.table(
            {"row_id": pa.array(range(n_docs), pa.int64()), "text": pa.array(rows)}
        )
        # max_bucket far below the bucket size AND max_group far below the
        # group size force both the hub routing and the chunked processing
        out = suffix_array_dedup_global(
            ray.data.from_arrow(t).repartition(8), length_threshold=100,
            num_partitions=4, max_bucket=8, max_group=8,
        ).to_pandas()
        assert not out["text"].str.contains("BOILER").any()
        # every doc survives (unique filler remains after the cut)
        assert len(out) == n_docs
