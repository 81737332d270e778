"""posting_state_union: merging two independently-built posting-index
states (family-agnostic — exercised via the n-gram Jaccard and video
frame-phash families) must equal one bootstrap over the union corpus:
identical merged posting files, identical cluster membership; the merged
state keeps accepting increments; guards refuse mismatched configs /
overlapping ids."""

from __future__ import annotations

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from text_dedup_ray.pipelines.incremental import load_meta
from text_dedup_ray.pipelines.incremental_jaccard import (
    jaccard_bootstrap,
    jaccard_increment,
    posting_state_union,
)

P = 4
JCFG = dict(ngram_size=1, min_length=0, threshold=0.5, num_partitions=P,
            df_cap=100)


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
            }
        )
    )


def _clusters_map(state_dir):
    out = {}
    for f in glob.glob(f"{state_dir}/v*/clusters/*.parquet"):
        t = pq.read_table(f)
        for r, c in zip(
            t["row_id"].to_numpy(zero_copy_only=False).tolist(),
            t["cluster_id"].to_numpy(zero_copy_only=False).tolist(),
        ):
            assert out.get(r, c) == c, f"row {r} has two cluster ids"
            out[r] = c
    return out


def _latest_clusters_map(state_dir, version):
    out = {}
    for f in glob.glob(f"{state_dir}/v{version:05d}/clusters/*.parquet"):
        t = pq.read_table(f)
        for r, c in zip(
            t["row_id"].to_numpy(zero_copy_only=False).tolist(),
            t["cluster_id"].to_numpy(zero_copy_only=False).tolist(),
        ):
            assert out.get(r, c) == c
            out[r] = c
    return out


def _index_rows(state_dir, version):
    out = []
    for f in sorted(glob.glob(f"{state_dir}/v{version:05d}/index/*.parquet")):
        t = pq.read_table(f)
        out.append((f.rsplit("/", 1)[-1], t.to_pandas().values.tolist()))
    return out


def test_jaccard_union_equals_full_bootstrap(tmp_path):
    # unigram shingles, threshold 0.5: cross-split pairs 0~10 (exact),
    # 1~12 (3/4), within-split pair 0~2 (2/4 = 0.5)
    a = [
        (0, "apple banana cherry date"),
        (1, "dog cat mouse"),
        (2, "apple banana cherry grape"),
        (3, "totally unrelated words live here"),
    ]
    b = [
        (10, "apple banana cherry date"),
        (11, "nothing matches this text"),
        (12, "dog cat mouse bird"),
    ]
    sa, sb, su, sf = (str(tmp_path / n) for n in ("a", "b", "u", "f"))
    jaccard_bootstrap(_ds(a), sa, id_column="doc_id", **JCFG)
    jaccard_bootstrap(_ds(b), sb, id_column="doc_id", **JCFG)
    version, merges = posting_state_union(sa, sb, su)
    assert version == 1
    jaccard_bootstrap(_ds(a + b), sf, id_column="doc_id", **JCFG)

    assert _index_rows(su, 1) == _index_rows(sf, 1)
    got, want = _latest_clusters_map(su, 1), _latest_clusters_map(sf, 1)
    assert got == want
    assert want[10] == 0 and want[12] == 1 and want[2] == 0
    # B's roots 10 and 12 lost to A's 0 and 1
    assert merges == {10: 0, 12: 1}
    assert load_meta(su)["max_row_id"] == 12


def test_jaccard_union_state_accepts_increments(tmp_path):
    a = [(0, "apple banana cherry date"), (1, "dog cat mouse")]
    b = [(10, "apple banana cherry date"), (11, "unique b words")]
    sa, sb, su, sf = (str(tmp_path / n) for n in ("a", "b", "u", "f"))
    jaccard_bootstrap(_ds(a), sa, id_column="doc_id", **JCFG)
    jaccard_bootstrap(_ds(b), sb, id_column="doc_id", **JCFG)
    posting_state_union(sa, sb, su)
    jaccard_bootstrap(_ds(a + b), sf, id_column="doc_id", **JCFG)

    c = [(20, "dog cat mouse"), (21, "fresh unseen material")]
    inc_u = jaccard_increment(_ds(c), su, id_column="doc_id")
    inc_f = jaccard_increment(_ds(c), sf, id_column="doc_id")
    assert inc_u.state_version == inc_f.state_version == 2
    assert _latest_clusters_map(su, 2) == _latest_clusters_map(sf, 2)
    assert _latest_clusters_map(su, 2)[20] == 1


def test_video_family_union(tmp_path):
    """Family-agnosticism: the same posting_state_union over two video
    frame-phash states equals the full video bootstrap."""
    from text_dedup_ray.data.gen import generate_videos
    from text_dedup_ray.pipelines.incremental_video import video_bootstrap
    from text_dedup_ray.sources.io import ROW_ID

    vids, _truth = generate_videos(24, seed=3)
    half = vids.num_rows // 2

    def with_ids(tbl, base):
        return ray.data.from_arrow(
            tbl.append_column(
                ROW_ID, pa.array(range(base, base + tbl.num_rows), pa.int64())
            )
        )

    ta, tb = vids.slice(0, half), vids.slice(half)
    sa, sb, su, sf = (str(tmp_path / n) for n in ("a", "b", "u", "f"))
    kw = dict(every_n=1, threshold=0.5, num_partitions=P)
    video_bootstrap(with_ids(ta, 0), sa, **kw)
    video_bootstrap(with_ids(tb, 1000), sb, **kw)
    posting_state_union(sa, sb, su)

    full = pa.concat_tables(
        [
            ta.append_column(ROW_ID, pa.array(range(0, half), pa.int64())),
            tb.append_column(
                ROW_ID,
                pa.array(range(1000, 1000 + tb.num_rows), pa.int64()),
            ),
        ]
    )
    video_bootstrap(ray.data.from_arrow(full), sf, **kw)
    assert _latest_clusters_map(su, 1) == _latest_clusters_map(sf, 1)
    assert _index_rows(su, 1) == _index_rows(sf, 1)


def test_posting_union_guards(tmp_path):
    a = [(0, "apple banana")]
    sa = str(tmp_path / "a")
    jaccard_bootstrap(_ds(a), sa, id_column="doc_id", **JCFG)

    st = str(tmp_path / "t")
    other = dict(JCFG, threshold=0.9)
    jaccard_bootstrap(_ds([(10, "x y")]), st, id_column="doc_id", **other)
    with pytest.raises(ValueError, match="different configs"):
        posting_state_union(sa, st, str(tmp_path / "u1"))

    so = str(tmp_path / "o")
    jaccard_bootstrap(_ds([(0, "apple banana")]), so, id_column="doc_id", **JCFG)
    with pytest.raises(ValueError, match="row-id intervals overlap"):
        posting_state_union(sa, so, str(tmp_path / "u2"))
