"""SimHash f=128 (the reference's second supported fingerprint width,
config/algorithms/simhash.py:302-303): byte-lane kernels vs the proven
f=64 uint64 fast path, scalar Permutation parity, end-to-end dedup vs the
two-lane DuckDB oracle, and the config guard for >64-bit bucket prefixes."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
import ray.data

from text_dedup_ray.functions.simhash import (
    SimHashConfig,
    SimHasher,
    permutation_keys_batch_bytes,
)

TEXTS = [
    f"the quick brown fox {i} jumps over the lazy dog number {i % 7}"
    for i in range(120)
] + ["", "ab", "identical doc body", "identical doc body"]


class TestByteLaneKernels:
    def test_f64_two_path_key_parity(self):
        # the bytes path must be bit-identical to the uint64 fast path
        sh = SimHasher(SimHashConfig(hash_func="md5"))
        sig_bytes = sh.signatures_batch_bytes(TEXTS)
        sigs = sh.signatures_batch(TEXTS)
        assert np.array_equal(
            sig_bytes.copy().view(">u8").reshape(-1).astype(np.uint64), sigs
        )
        assert np.array_equal(
            sh.keys_batch(sigs),
            permutation_keys_batch_bytes(sh.perms, 64, sig_bytes),
        )

    def test_f128_scalar_parity(self):
        # batch byte kernels == the scalar int-domain Permutation math
        sh = SimHasher(SimHashConfig(f=128, hash_func="md5"))
        sb = sh.signatures_batch_bytes(TEXTS)
        keys = sh.keys_batch_bytes(sb)
        for i in (0, 7, 120, 122):
            sig_int = int.from_bytes(sb[i].tobytes(), "big")
            assert sig_int == sh.signature(TEXTS[i])
            for j, p in enumerate(sh.perms):
                # engine keys are the top 64 bits of the left-aligned
                # 128-bit ``permute(sig) & search_mask``
                assert int(keys[i, j]) == p.key(sig_int) >> 64

    def test_empty_doc_signature_zero(self):
        sh = SimHasher(SimHashConfig(f=128, hash_func="md5"))
        sb = sh.signatures_batch_bytes(["", "abc def ghi"])
        assert not sb[0].any()  # empty shingle set -> all-zero signature

    def test_wide_prefix_rejected_at_config_time(self):
        with pytest.raises(NotImplementedError, match="bucket prefix"):
            SimHashConfig(f=128, num_bucket=8, bit_diff=2)  # 96-bit prefix

    def test_f128_num_bucket8_supported(self):
        # 16-bit blocks, 5-block prefix = 80 bits -> rejected; bit_diff=5
        # leaves a 48-bit prefix -> fine
        cfg = SimHashConfig(f=128, num_bucket=8, bit_diff=5, hash_func="md5")
        sh = SimHasher(cfg)
        sb = sh.signatures_batch_bytes(TEXTS[:10])
        keys = sh.keys_batch_bytes(sb)
        assert keys.shape == (10, len(sh.perms))


class TestF128EndToEnd:
    def test_dedup_matches_two_lane_sql_oracle(self):
        from text_dedup_ray.oracles import simhash_dedup_sql
        from text_dedup_ray.pipelines.simhash import simhash_dedup

        cfg = SimHashConfig(f=128, hash_func="md5")
        sf = "/root/testdata/sf0.001"
        import os

        if not os.path.exists(f"{sf}/documents.parquet"):
            pytest.skip("testdata absent")
        ds = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        res = simhash_dedup(ds, text_column="text", id_column="doc_id", cfg=cfg)
        ours = sorted(res.deduped.select_columns(["doc_id"]).to_pandas()["doc_id"])
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        theirs = sorted(con.execute(simhash_dedup_sql(cfg)).fetchdf()["doc_id"])
        assert ours == theirs

    def test_incremental_f128_matches_full_rerun(self, tmp_path):
        # the tiered index at f=128 (28-byte packed keys) must equal the
        # batch run over old ∪ new — same guarantee as the f=64 path
        import pyarrow as pa

        from text_dedup_ray.pipelines.incremental import (
            simhash_bootstrap,
            simhash_increment,
        )
        from text_dedup_ray.pipelines.simhash import simhash_dedup

        cfg = SimHashConfig(f=128, hash_func="md5")
        # old batch: 9 planted duplicate groups; new batch: half duplicate
        # the old groups, half are unique (so increments emit survivors)
        texts = [
            f"caption body variant {i % 9} with filler tokens {i % 4}"
            for i in range(60)
        ] + [
            f"caption body variant {i % 9} with filler tokens {i % 4}"
            if i % 2 == 0
            else f"a wholly new unique caption number {i} with extra words {i * 7}"
            for i in range(60, 80)
        ]

        def docs(ids, txts):
            return ray.data.from_arrow(pa.table({"doc_id": ids, "text": txts}))

        state = str(tmp_path / "state128")
        simhash_bootstrap(
            docs(list(range(60)), texts[:60]), state, cfg=cfg,
            id_column="doc_id", num_partitions=8,
        )
        inc = simhash_increment(
            docs(list(range(100, 120)), texts[60:]), state, cfg=cfg,
            id_column="doc_id",
        )
        full = simhash_dedup(
            docs(list(range(60)) + list(range(100, 120)), texts),
            cfg=cfg, id_column="doc_id",
        )
        inc_survivors = set(
            inc.deduped.select_columns(["doc_id"]).to_pandas()["doc_id"]
        )
        full_new = {
            r for r in full.deduped.select_columns(["doc_id"]).to_pandas()["doc_id"]
            if r >= 100
        }
        assert inc_survivors == full_new

    def test_identical_docs_collapse_at_f128(self):
        import pyarrow as pa

        from text_dedup_ray.pipelines.simhash import simhash_dedup

        tbl = pa.table(
            {
                "doc_id": list(range(20)),
                "text": ["a duplicated caption body here"] * 20,
            }
        )
        res = simhash_dedup(
            ray.data.from_arrow(tbl),
            text_column="text",
            id_column="doc_id",
            cfg=SimHashConfig(f=128, hash_func="md5"),
        )
        assert res.deduped.count() == 1
